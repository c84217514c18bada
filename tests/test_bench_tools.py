"""Unit tests for the benchmark tooling's parsers (no TPU needed).

The overlap evidence (benchmarks/results/overlap_check_*_r4.json) and the
per-category trace decompositions in docs/performance.md are produced by
parsers over compiled-HLO text / xplane traces; these tests pin their
semantics on synthetic inputs so a silent format drift can't corrupt the
committed evidence.
"""
import importlib.util
import os
import sys

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_overlap_analyze_schedule_sync_async_and_bytes():
    oc = _load("overlap_check",
               os.path.join(ROOT, "benchmarks", "overlap_check.py"))
    text = "\n".join([
        # tuple-shaped SYNC all-reduce inside a while body (bf16):
        "  %all-reduce.66 = (bf16[1,3,3,1024,1024]{4}, bf16[1,1024]{1}) "
        "all-reduce(%a, %b), metadata={op_name=\"while/body/x\"}",
        # async pair with compute scheduled between start and done:
        "  %ars = f32[237270425]{0} all-reduce-start(%g), channel_id=1",
        "  %conv1 = f32[8]{0} convolution(%x, %w)",
        "  %fus = f32[8]{0} fusion(%conv1)",
        "  %ard = f32[237270425]{0} all-reduce-done(%ars)",
        # a get-tuple-element mentioning all-reduce must NOT count:
        "  %gte = bf16[1,1024]{1} get-tuple-element(%all-reduce.66), index=1",
    ])
    res = oc.analyze_schedule(text)
    assert len(res) == 2
    sync = [r for r in res if r["form"] == "sync"]
    asy = [r for r in res if r["form"] == "async"]
    assert len(sync) == 1 and len(asy) == 1
    # tuple bytes: 1*3*3*1024*1024*2 + 1*1024*2
    assert sync[0]["bytes"] == 9 * 1024 * 1024 * 2 + 1024 * 2
    assert sync[0]["bf16"] is True
    assert sync[0]["in_loop_body"] is True
    assert asy[0]["bytes"] == 237270425 * 4
    assert asy[0]["compute_ops_between"] == 2
    assert asy[0]["sched_ops_between"] == 2


def test_trace_band_and_category_summaries(tmp_path, capsys):
    import gzip
    import json

    ts = _load("trace_step",
               os.path.join(ROOT, "benchmarks", "trace_step.py"))
    events = [
        {"ph": "M", "name": "process_name", "pid": 7,
         "args": {"name": "/device:TPU:0"}},
        # container spans that must be EXCLUDED from device totals
        {"ph": "X", "pid": 7, "name": "jit_step(123)", "dur": 900_000},
        {"ph": "X", "pid": 7, "name": "0", "dur": 300_000},
        # real ops: one >=8ms/call, one small
        {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 30_000,
         "args": {"hlo_category": "convolution fusion"}},
        {"ph": "X", "pid": 7, "name": "transpose_jvp___.9", "dur": 9_000,
         "args": {"hlo_category": "custom-call",
                  "source": ".../ops/pallas_resample.py:419"}},
        {"ph": "X", "pid": 7, "name": "copy.3.remat_uncompressed",
         "dur": 1_500, "args": {"hlo_category": "data formatting"}},
    ]
    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    with gzip.open(str(d / "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)

    ts.summarize(str(tmp_path), steps=1)
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    total = out[0]["device_total_ms_per_step"]
    # containers excluded: 30ms + 9ms + 1.5ms (dur is in us)
    assert abs(total - 40.5) < 0.01
    bands = {o["band"]: o for o in out if "band" in o}
    assert bands[">=8ms"]["ms_per_step"] == 39.0  # 30ms + 9ms per-call ops
    assert bands["0.5-2ms"]["calls_per_step"] == 1  # the 1.5ms remat copy

    ts.summarize_by_category(str(tmp_path), steps=1)
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    cats = {o["category"]: o for o in out if "category" in o}
    # the custom-call from pallas_resample is attributed as a kernel, and
    # the .remat copy is tagged
    assert "pallas resample kernels" in cats
    assert "data formatting [remat]" in cats
    assert "convolution fusion" in cats
