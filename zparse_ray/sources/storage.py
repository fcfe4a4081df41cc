"""Storage seam: Lance when available, Parquet otherwise (SURVEY §7.0).

The north rule names Lance tables; this container has no lance wheel,
so every reader/writer goes through this seam and picks the best
available format. The pipeline code never mentions a format directly.
"""

from __future__ import annotations

import importlib.util

HAVE_LANCE = importlib.util.find_spec("lance") is not None


def read_dataset(paths, *, columns=None, **kwargs):
    """ray.data reader for the given file/dir paths."""
    import ray.data as rd

    if HAVE_LANCE and (isinstance(paths, str) and paths.endswith(".lance")):
        return rd.read_lance(paths, columns=columns, **kwargs)
    return rd.read_parquet(paths, columns=columns, **kwargs)


def write_dataset(ds, path: str, **kwargs):
    if HAVE_LANCE and path.endswith(".lance"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)


def read_table(path: str, *, columns=None):
    """Driver-side (non-Ray) table read."""
    if HAVE_LANCE and path.endswith(".lance"):
        import lance

        return lance.dataset(path).to_table(columns=columns)
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns)
