"""Housenumber parsing / canonicalization / explosion.

Vectorized (pyarrow.compute / numpy) re-expressions of the reference's
housenumber semantics:

- multi-value split        (reference ``bano/core.py:141-156``)
- range expansion          (reference ``out/banout.sh:8-30``)
- canonical dedup key      (reference ``bano/sql/export_csv_dept.sql:8``)
- plausibility filters     (reference ``bano/sql/export_csv_dept.sql:92-94``)
- validity                 (reference ``bano/helpers.py:89-92``)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ',à;-/*' all become '$' then split (bano/core.py:141)
_MULTI_SPLIT = str.maketrans(",à;-/*", "$$$$$$")

_LEADING_ZEROS = re.compile(r"^0*")
_NON_DIGIT = re.compile(r"[^0-9]")

PLAUSIBLE_RE = r"^[0-9]{1,4}( ?[A-Z]?.*)?"
IMPLAUSIBLE_RE = r".[0-9 .-]{9,}"


def split_multi(numero: str) -> list[str]:
    """Explode an OSM multi-number string; each part stripped."""
    return [p.strip() for p in numero.translate(_MULTI_SPLIT).split("$")]


def expand_range(numero: str) -> list[str]:
    """``'12-18'`` → ``['12','14','16','18']``-style expansion is NOT what the
    reference does — it splits on '-' into the two endpoints only, and only
    when the first numeric part is strictly below the second
    (``out/banout.sh:13-22``). Returns the split parts, else [numero]."""
    if "-" not in numero:
        return [numero]
    parts = numero.split("-")
    a = int("0" + _NON_DIGIT.sub("", parts[0]))
    b = int("0" + _NON_DIGIT.sub("", parts[1])) if len(parts) > 1 else 0
    if a < b:
        return [p.strip() for p in parts]
    return [numero]


def canonical_num(numero: str) -> str:
    """The cross-source dedup key for a housenumber
    (reference ``bano/sql/export_csv_dept.sql:8``)."""
    s = _LEADING_ZEROS.sub("", numero.upper())
    s = s.replace("BIS", "B").replace("TER", "T").replace("QUATER", "Q").replace("QUAT", "Q")
    s = s.replace(" ", "").replace("à", "-").replace(";", ",").replace('"', "")
    return s


def canonical_num_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized :func:`canonical_num` with pyarrow.compute kernels."""
    s = pc.utf8_upper(arr)
    s = pc.replace_substring_regex(s, "^0*", "")
    for old, new in (("BIS", "B"), ("TER", "T"), ("QUATER", "Q"), ("QUAT", "Q"),
                     (" ", ""), ("à", "-"), (";", ","), ('"', "")):
        s = pc.replace_substring(s, old, new)
    return s


def plausible_mask(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Boolean mask of plausible housenumbers
    (reference ``bano/sql/export_csv_dept.sql:92-94``)."""
    ok = pc.match_substring_regex(arr, PLAUSIBLE_RE)
    ok = pc.and_(ok, pc.invert(pc.equal(arr, "99999")))
    ok = pc.and_(ok, pc.invert(pc.match_substring_regex(arr, IMPLAUSIBLE_RE)))
    return ok


def is_valid_housenumber(hsnr: str | None) -> bool:
    """Reference ``bano/helpers.py:89-92``."""
    if hsnr:
        return len(hsnr) <= 11
    return False


def valid_mask(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    nonempty = pc.and_(arr.is_valid(), pc.greater(pc.utf8_length(arr), 0))
    return pc.and_(nonempty, pc.less_equal(pc.utf8_length(arr), 11))


def explode_osm_numbers(numeros: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """OSM multi-value explode (reference ``bano/core.py:141-156``: every one
    of ``,à;-/*`` splits, unconditionally).

    Returns (row_indices, exploded_numbers) for rebuilding companion columns
    with ``np.take`` — the flat_map stays vectorized outside the small
    per-string Python work.
    """
    idx: list[int] = []
    out: list[str] = []
    for i, raw in enumerate(numeros):
        if raw is None:
            continue
        for num in split_multi(str(raw)):
            idx.append(i)
            out.append(num)
    return np.asarray(idx, dtype=np.int64), np.asarray(out, dtype=object)


def explode_ranges(numeros: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Export-stage conditional range explode (reference ``out/banout.sh:8-30``):
    ``;``/``à``/``,`` always split; ``-`` splits into its two endpoint parts
    only when the first numeric part is strictly below the second."""
    idx: list[int] = []
    out: list[str] = []
    for i, raw in enumerate(numeros):
        if raw is None:
            continue
        s = str(raw)
        parts = [p.strip() for p in re.split(r"[;à,]", s)] if re.search(r"[;à,]", s) else [s]
        for part in parts:
            for num in expand_range(part):
                idx.append(i)
                out.append(num.strip())
    return np.asarray(idx, dtype=np.int64), np.asarray(out, dtype=object)
