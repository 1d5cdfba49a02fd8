"""Expression combinators missing from pyspark.sql.functions."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["let"]


def let(binding: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``binding`` exactly once and pass it to ``body`` as a bound
    lambda variable.

    Spark SQL has no let-expression, and Catalyst's CollapseProject will
    inline an aliased column into its consumer.  When the consumer embeds
    the reference inside a higher-order-function lambda, the inlined
    expression is re-evaluated on every lambda iteration — e.g. a shingle
    array rebuilt once per minhash seed, turning O(shingles + seeds) into
    O(shingles × seeds).  Wrapping the value in a single-element array and
    binding it through ``transform`` makes it a lambda *variable*: the
    argument array is evaluated once per row and every use inside ``body``
    is an O(1) variable lookup.
    """
    return F.element_at(F.transform(F.array(binding), body), 1)
