"""rendernet_tpu — a TPU-native differentiable rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
thunguyenphuoc/RenderNet (NeurIPS 2018): differentiable voxel rendering via a
rigid-body pose transform + trilinear resample, a learned projection unit,
conv encoder/decoder rendering networks, Phong shading, full training
workloads (shader, texture/normal face), gradient-based inverse rendering,
and multi-chip data parallelism over a jax.sharding Mesh.
"""

__version__ = "0.1.0"
