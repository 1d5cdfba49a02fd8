"""Leaf-type sentinels for contract declarations.

The reference's closed leaf set (ContractsCore.scala:159-173, mapped to
Spark types at SparkCore.scala:239-251) distinguishes Int/Long/Short/Byte
and Float/Double, which plain Python annotations cannot.  These sentinel
classes fill the gap; plain Python builtins map to the widest member of
each family (int -> long, float -> double, datetime -> timestamp).
"""

from __future__ import annotations


class int8:
    """ByteType leaf (reference `Byte`, SparkCore.scala:243)."""


class int16:
    """ShortType leaf (reference `Short`, SparkCore.scala:242)."""


class int32:
    """IntegerType leaf (reference `Int`, SparkCore.scala:240)."""


class int64:
    """LongType leaf (reference `Long`, SparkCore.scala:241)."""


class float32:
    """FloatType leaf (reference `Float`, SparkCore.scala:245)."""


class float64:
    """DoubleType leaf (reference `Double`, SparkCore.scala:244)."""


class timestamp_ntz:
    """TimestampNTZType leaf (reference `java.time.LocalDateTime`,
    SparkCore.scala:251)."""


# aliases matching the reference's Scala spelling
Byte = int8
Short = int16
Int = int32
Long = int64
Float = float32
Double = float64
