"""Command-line entry points.

``python -m rendernet_tpu.cli <command>`` with commands:
  render       — pretrained Phong-shading demo (RenderNet_demo.py parity)
  train-shader — shader workload trainer (RenderNet_Shader.py parity)
  train-texture— texture/normal face trainer
  reconstruct  — gradient-based inverse rendering
  pack-tar     — pack an image directory into a training tar
  convert      — checkpoint/npz weight conversion tools
"""
