"""Multi-chip SPMD: mesh construction, shardings, chunk-parallel solves."""

from autoinst_tpu.parallel.mesh import (make_mesh, shard_leading,
                                        replicate, fiedler_sharded,
                                        psum_metrics)
