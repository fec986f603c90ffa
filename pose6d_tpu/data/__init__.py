from .ply import read_ply, write_ply_points, write_ply_mesh  # noqa: F401
