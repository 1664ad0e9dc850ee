"""Compat shim — the catalog lives in plans/catalog/ since round 13.

The 12k-line single-file catalog (251+ query builders + oracles) was
split into per-family modules (catalog/relational, preprocessing_ml,
model_selection, stats_tests, drift, datapipe_dedup, datapipe_text,
with shared fixed-point helpers in catalog/_shared — conventions
documented there). This module stays the stable import path:
build_catalog() plus every historical q_*/sql_*/constant name resolves
here via PEP-562 __getattr__.
"""

from __future__ import annotations

from .catalog import _MODULES, build_catalog  # noqa: F401
from .catalog import _shared as _shared_mod


def __getattr__(name: str):
    for _m in [_shared_mod] + _MODULES:
        if hasattr(_m, name):
            return getattr(_m, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}")
