"""writeAsNamedFiles: write exactly N files with controlled names.

Re-expresses WriteAsNamedFilesAction.scala:27-68 with its naming contract
(TestWriteAsNamedFilesAction.scala:12-141): repartition to N, write to a
temp dir, glob the ``part-*`` files, rename each to the destination as

* ``prefix<ext>`` for one file, ``prefix.<i><ext>`` otherwise, with
  ``i`` 1-based and ZERO-PADDED to the width of N
  (``file.01.snappy.parquet`` .. ``file.10.snappy.parquet``);
* ``<ext>`` is everything from the part file's first dot — the full
  compound extension survives (``.snappy.parquet``, ``.csv.gz``), and
  ``text`` format yields Spark's ``.txt`` files;
* finding a different number of part files than requested is an error
  (WriteAsNamedFilesAction.scala:36-37), as is asking for more than one
  ``text`` file (checkTextWriteOptions — the text writer cannot split).

One deliberate divergence: an existing destination file is overwritten
(delete-then-rename) so a re-run after a crash is idempotent, consistent
with this engine's quarantine-then-rerun story; the reference fails the
rename instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..dataflow.exceptions import DataFlowException


def write_as_named_files_body(context, df: DataFrame, dest_path: str,
                              num_files: int, prefix: str, fmt: str,
                              options: dict[str, str]) -> None:
    if context.temp_folder is None:
        raise ValueError("write_as_named_files requires a flow temp folder")
    if fmt == "text" and num_files > 1:
        raise ValueError(
            "When writing text files only 1 file is able to be written")
    ops = context.file_ops
    tmp = f"{context.temp_folder}/namedFiles/{prefix}"
    (df.repartition(num_files).write.options(**options)
       .mode("overwrite").format(fmt).save(tmp))
    want = "txt" if fmt == "text" else fmt
    parts = sorted(n for n in ops.list_files(tmp)
                   if n.startswith("part-") and f".{want}" in n)
    if len(parts) != num_files:
        raise DataFlowException(
            f"Number of files found [{len(parts)}] did not match "
            f"requested number of files [{num_files}]")
    ops.mkdirs(dest_path)
    width = len(str(num_files))
    for i, name in enumerate(parts):
        ext = name[name.index("."):] if "." in name else f".{want}"
        number = "" if num_files == 1 else f".{i + 1:0{width}d}"
        dest = f"{dest_path}/{prefix}{number}{ext}"
        ops.delete(dest, recursive=False)
        if not ops.rename(f"{tmp}/{name}", dest):
            raise IOError(f"Failed to rename [{tmp}/{name}] -> [{dest}]")
