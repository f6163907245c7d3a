"""syconn_tpu — TPU-native connectomics framework.

A from-scratch rebuild of the capabilities of SyConn
(StructuralNeurobiologyLab/SyConn): synaptic-connectivity inference from
dense EM segmentation. Where the reference fans out SLURM jobs and drops to
Cython/numba/OpenGL for hot loops, this framework is a single sharded JAX
program: Pallas/XLA kernels for voxel scans, contact-site stencils, marching
cubes and an orthographic mesh rasterizer; ``pjit``/``shard_map`` with ICI
halo exchange for the chunked volume decomposition; and a thin async host-IO
layer for the chunked dataset and object storages.

Reference layer map: see SURVEY.md at the repository root.
"""

__version__ = "0.1.0"

from . import global_params  # noqa: F401
