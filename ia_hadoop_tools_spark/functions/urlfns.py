"""URL resolution.

Reference: the URLResolverFunc spec exists only as its test
(src/test/java/org/archive/hadoop/func/URLResolverFuncTest.java:5-46): resolve
a possibly-relative URL against a base URL, falling back to the via URL when
the base is unusable.

Arrow-batched pandas UDF over ``urllib.parse.urljoin`` (string surgery too
irregular for column expressions; cold path — used during WAT extraction).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

#: absolute iff it STARTS with a scheme — a substring '://' test would
#: treat 'out.html?u=http://x.com' (absolute URL embedded in the query of
#: a relative link) as already absolute and skip resolution
_ABS = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")


def _resolve(rel: str | None, base: str | None, via: str | None) -> str | None:
    if rel is None:
        return None
    if _ABS.match(rel):  # already absolute
        return rel
    for anchor in (base, via):
        if anchor and _ABS.match(anchor):
            try:
                return urljoin(anchor, rel)
            except ValueError:
                continue
    return rel


@pandas_udf(StringType())
def url_resolve_udf(rel: pd.Series, base: pd.Series, via: pd.Series) -> pd.Series:
    """resolve(rel, base, via): absolute URL for ``rel`` against base, else via."""
    return pd.Series(
        [_resolve(r, b, v) for r, b, v in zip(rel, base, via)], dtype="object"
    )
