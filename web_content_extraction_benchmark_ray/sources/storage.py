"""Storage shim: Lance-first table access with a parquet fallback.

The north rule's input is "Lance tables of interleaved text + media
documents".  `pylance` is not installed in this sandbox, so every dataset
here is written/read as an identical-schema multi-file parquet layout;
this shim keeps the swap to Lance a one-liner — call sites use
``read_table(uri)`` / ``write_table(ds, uri)`` and never name a format.

Format resolution:
- a ``.lance`` uri (or ``format='lance'``) uses ``ray.data.read_lance`` /
  ``Dataset.write_lance`` when pylance is importable, else raises with a
  clear message;
- anything else is the parquet path (directory of part files — the
  fragment-set layout both formats share).
"""
from __future__ import annotations


def _have_lance() -> bool:
    try:  # pragma: no cover - pylance absent in this sandbox
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(uri: str, *, columns=None, override_num_blocks=None,
               format: str | None = None):
    import ray.data

    fmt = format or ("lance" if uri.endswith(".lance") else "parquet")
    if fmt == "lance":
        if not _have_lance():
            raise RuntimeError(
                "pylance is not installed; store the table as parquet "
                "(same schema, same fragment layout) or install pylance"
            )
        return ray.data.read_lance(uri, columns=columns)  # pragma: no cover
    return ray.data.read_parquet(
        uri, columns=columns, override_num_blocks=override_num_blocks
    )


def write_table(ds, uri: str, *, format: str | None = None) -> None:
    fmt = format or ("lance" if uri.endswith(".lance") else "parquet")
    if fmt == "lance":
        if not _have_lance():
            raise RuntimeError(
                "pylance is not installed; write parquet instead"
            )
        ds.write_lance(uri)  # pragma: no cover
        return
    ds.write_parquet(uri)
