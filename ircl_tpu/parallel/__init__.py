"""Device mesh, shardings, and distributed top-k collectives."""

from ircl_tpu.parallel.mesh import make_mesh

__all__ = ["make_mesh"]
