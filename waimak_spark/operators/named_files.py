"""writeAsNamedFiles: write exactly N files with controlled names.

Re-expresses WriteAsNamedFilesAction.scala:27-68: repartition to N, write to
a temp dir, glob the ``part-*`` files, rename each to
``prefix[.i].<ext>`` in the destination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_as_named_files_body(context, df: DataFrame, dest_path: str,
                              num_files: int, prefix: str, fmt: str,
                              options: dict[str, str]) -> None:
    if context.temp_folder is None:
        raise ValueError("write_as_named_files requires a flow temp folder")
    ops = context.file_ops
    tmp = f"{context.temp_folder}/namedFiles/{prefix}"
    (df.repartition(num_files).write.options(**options)
       .mode("overwrite").format(fmt).save(tmp))
    parts = sorted(n for n in ops.list_files(tmp) if n.startswith("part-"))
    if len(parts) != num_files:
        # fewer rows than partitions can yield fewer part files; tolerate
        pass
    ops.mkdirs(dest_path)
    for i, name in enumerate(parts):
        ext = "".join(
            s for s in [f".{fmt}"] if name.endswith(fmt) or "." not in name
        ) or f".{fmt}"
        target = (
            f"{prefix}{ext}" if len(parts) == 1 else f"{prefix}.{i + 1}{ext}"
        )
        dest = f"{dest_path}/{target}"
        ops.delete(dest, recursive=False)
        if not ops.rename(f"{tmp}/{name}", dest):
            raise IOError(f"Failed to rename [{tmp}/{name}] -> [{dest}]")
