"""img2table_spark — a from-scratch PySpark-native table identification and
extraction engine with the capabilities of xavctn/img2table.

Architecture (Spark-first, NOT a port):
  Iceberg/parquet scan of multi-turn transcripts
    -> salted repartition on conv_id (skew defusal)
    -> Arrow-batched pandas UDFs wrapping vectorized NumPy kernels
       (payload decode -> geometry -> text assembly)
    -> extracted-table sink + per-partition checkpoint manifests.

The reference (/root/reference, read-only) defines WHAT is computed; every
kernel docstring cites the reference file:line whose behavior it matches.
"""

__version__ = "0.1.0"
