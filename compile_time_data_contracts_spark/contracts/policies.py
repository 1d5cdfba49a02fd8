"""The 8-member schema-compatibility policy family.

Mirrors the reference's policy singletons (ContractsCore.scala:43-62) and
the flag derivation used by both the construction-time prover
(ContractsCore.scala:224-234) and the runtime dispatch
(SparkCore.scala:150-189):

  Exact            -> unordered, case-insensitive names
  ExactUnorderedCI -> unordered, case-insensitive names (alias of Exact)
  ExactOrdered     -> ordered,   case-sensitive names
  ExactOrderedCI   -> ordered,   case-insensitive names
  ExactByPosition  -> positional, names ignored
  Backward         -> unordered CS; missing allowed iff optional/default;
                      extras allowed
  Forward          -> unordered CS; missing allowed; extras rejected
  Full             -> always compatible
"""

from __future__ import annotations

import enum


class SchemaPolicy(enum.Enum):
    EXACT = "Exact"
    EXACT_UNORDERED_CI = "ExactUnorderedCI"
    EXACT_ORDERED = "ExactOrdered"
    EXACT_ORDERED_CI = "ExactOrderedCI"
    EXACT_BY_POSITION = "ExactByPosition"
    BACKWARD = "Backward"
    FORWARD = "Forward"
    FULL = "Full"

    @property
    def ordered(self) -> bool:
        return self in (SchemaPolicy.EXACT_ORDERED, SchemaPolicy.EXACT_ORDERED_CI)

    @property
    def by_position(self) -> bool:
        return self is SchemaPolicy.EXACT_BY_POSITION

    @property
    def case_insensitive(self) -> bool:
        return self in (
            SchemaPolicy.EXACT,
            SchemaPolicy.EXACT_UNORDERED_CI,
            SchemaPolicy.EXACT_ORDERED_CI,
        )
