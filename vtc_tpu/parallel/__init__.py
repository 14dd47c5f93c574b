"""Multi-chip scaling: device meshes, sharded train steps, collectives.

The reference library is strictly single-GPU (SURVEY.md section 2.2); this
package is the framework's scaling story, built the TPU way:

  * a ``jax.sharding.Mesh`` with a ``data`` axis (batch sharding) and an
    optional ``code`` axis (dictionary-row sharding for very large /
    overcomplete dictionaries -- the tensor-parallel analogue here),
  * ONE fused train step jitted with explicit NamedShardings; XLA/GSPMD
    inserts the psum / all-gather collectives over ICI,
  * an explicit shard_map data-parallel step whose dictionary gradient
    and Hessian-diagonal statistics are psum-reduced -- bit-equivalent
    (up to reduction order) to the single-device step on the same global
    batch, verified in tests/test_parallel.py on a virtual 8-device mesh.
"""
from vtc_tpu.parallel.mesh import dp_axes, make_mesh
from vtc_tpu.parallel.data_parallel import (
    build_dp_local_step, build_pjit_train_step,
    build_shard_map_train_step)
