"""Debug/interop index exports — the reference's S4-S6 sink formats.

The reference writes its flat index relation as parquet, single-file CSV
(``coalesce(1)``), JSON, or TSV-renamed-to-``inverted_index.txt``
(reference: Indexer/inverted_index.py:120-133), then merges CSV parts
driver-side with pandas (Indexer/merge_index_files.py:5-15). These are
driver conveniences for eyeballing a small index, not scale paths — at
scale a single-file write serializes the entire dataset through one
task. This module reproduces the surface with the same semantics, but:

- ``single_file`` is opt-in and refuses above a row threshold instead of
  silently funnelling 100 TB through ``coalesce(1)``;
- the part-file rename trick (glob ``part-*``, move to a stable name) is
  kept for parity with the reference's TSV output.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame

SINGLE_FILE_MAX_ROWS = 5_000_000

FORMATS = ("parquet", "csv", "json", "tsv")


def export_index(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    single_file: bool = False,
    filename: str | None = None,
) -> str:
    """Write ``df`` to ``path`` in ``fmt``. With ``single_file`` the
    output is coalesced to one part and renamed to ``filename`` (default
    ``inverted_index.<ext>`` — the reference's ``inverted_index.txt``
    convention for tsv, inverted_index.py:127-133). Returns the final
    file or directory path."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    out = df
    if single_file:
        if "://" in path and not path.startswith("file://"):
            raise ValueError(
                "single_file export renames part files with local "
                f"os/glob calls — not supported for {path!r}; write "
                "partitioned and post-process on the target store"
            )
        # bounded probe: a full count() would re-execute the entire
        # upstream pipeline just to learn it is too big
        n = df.limit(SINGLE_FILE_MAX_ROWS + 1).count()
        if n > SINGLE_FILE_MAX_ROWS:
            raise ValueError(
                f"single_file export refused: > {SINGLE_FILE_MAX_ROWS} "
                "rows (a coalesce(1) write serializes everything "
                "through one task; use the partitioned form)"
            )
        out = df.coalesce(1)

    writer = out.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
        ext = "parquet"
    elif fmt == "csv":
        writer.option("header", True).csv(path)
        ext = "csv"
    elif fmt == "json":
        writer.json(path)
        ext = "json"
    else:  # tsv: csv with tab delimiter, reference's --format tsv branch
        writer.option("header", True).option("delimiter", "\t").csv(path)
        ext = "txt"

    if not single_file:
        return path
    part = sorted(
        p
        for p in glob.glob(os.path.join(path, "part-*"))
        if not p.endswith(".crc")
    )[0]
    final = os.path.join(path, filename or f"inverted_index.{ext}")
    shutil.move(part, final)
    return final
