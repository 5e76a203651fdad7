"""Small scalar validity / extraction helpers.

Reference: ``bano/helpers.py`` (is_valid_fantoir:179-180,
get_code_dept_from_insee:97-101, find_cp_in_tags:6-7) and
``bano/sources/ban2fantoir.py:18-19`` (pseudo-FANTOIR ids).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def is_valid_fantoir(f: str, insee: str) -> bool:
    return len(f) == 10 and f[0:5] == insee


def valid_fantoir_mask(fantoir: pa.Array, insee: pa.Array) -> pa.Array:
    """Vectorized: 10 chars and prefix equals the zone id."""
    ok = pc.equal(pc.utf8_length(fantoir), 10)
    return pc.and_kleene(ok, pc.equal(pc.utf8_slice_codeunits(fantoir, 0, 5), insee))


def get_code_dept_from_insee(code_insee: str) -> str:
    code_dept = code_insee[0:2]
    if code_dept == "97":
        code_dept = code_insee[0:3]
    return code_dept


def dept_array(insee: pa.Array) -> pa.Array:
    two = pc.utf8_slice_codeunits(insee, 0, 2)
    three = pc.utf8_slice_codeunits(insee, 0, 3)
    return pc.if_else(pc.equal(two, "97"), three, two)


def fantoir9_to_candidate(fantoir_ban: str) -> str:
    """BAN FANTOIR id repair key: drop position 5 (the rivoli check char slot)
    — reference ``bano/core.py:113``."""
    return f"{fantoir_ban[0:5]}{fantoir_ban[6:10]}"


def pseudo_fantoir(index: int, code_insee: str) -> str:
    """Pseudo registry id for unmatched BAN street names —
    reference ``bano/sources/ban2fantoir.py:18-19``."""
    return f"{code_insee}b{str(index).ljust(4, 'b')}"


def find_cp_in_tags(tags: dict) -> str:
    return tags.get("addr:postcode") or tags.get("postal_code") or ""


def append_suffixe(name: str, suffixe: str) -> str:
    """M13: append a hamlet suffix to a street name unless already suffixed
    (length-aware check — reference ``bano/core.py:33-45``, quirks and all:
    the comparison slices by the RAW suffix length but compares against the
    raw name tail)."""
    from .normalize import normalize

    res = name
    if suffixe:
        name_norm = normalize(name)
        ln = len(name_norm)
        ls = len(suffixe)
        if ln > ls:
            if name[-ls:] != suffixe:
                res = name + " " + suffixe
        else:
            res = name + " " + suffixe
    return res
