"""Value stringification (operator P5).

Reference: ``ErrorUtil.toString`` (streams-bootstrap) renders Avro records
as JSON and primitives via String.valueOf — asserted at
DeadLetterAnalyzerTopologyTest.java:409,659,672 (``{"id":0}`` etc.).

Spark: ``to_json`` for struct-typed columns, plain string cast otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stringify(df: DataFrame, col_name: str) -> Column:
    """Render a column as the reference would: structs -> JSON, else cast."""
    dtype = df.schema[col_name].dataType
    col = F.col(col_name)
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        return F.to_json(col)
    return col.cast("string")
