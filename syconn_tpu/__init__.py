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

import logging as _logging
import os as _os
import sys as _sys

# module loggers (syconn_tpu.testdata, .points, ...) propagate here; without
# a package-level handler Python drops INFO records silently (observed: the
# world generator's device/host dispatch decision never reached any log).
_pkg_log = _logging.getLogger("syconn_tpu")
if not _pkg_log.handlers and not _os.environ.get("SYCONN_TPU_QUIET"):
    _h = _logging.StreamHandler(_sys.stdout)
    _h.setFormatter(
        _logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S")
    )
    _pkg_log.addHandler(_h)
    _pkg_log.setLevel(_logging.INFO)

from . import global_params  # noqa: F401,E402
