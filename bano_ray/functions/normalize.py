"""French street-name canonicalization — the engine's merge-key function.

Re-implements, with exact fidelity, the reference normalization semantics of
osm-fr/bano (``bano/helpers.py:106-168`` + ``bano/constants.py:13-51`` and the
dictionary data files under ``bano/dictionnaires/``).  The normalized string is
THE merge key for every cross-source street match, so this function is
replicated bug-for-bug (including the BOM on the first ``abrev_type_voie``
entry, trailing-space roman-numeral keys, and final-line truncation caused by
the reference's newline stripping).  Dictionaries are shipped as a JSON data
asset (``bano_ray/assets/normalize_dicts.json``).

Hot-path usage is :func:`normalize_array`, which exploits the low cardinality
of street names inside a batch: the scalar rewrite runs once per *unique*
value (memoized per-process) and is broadcast back with pyarrow/numpy — never
once per row.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import numpy as np

_ASSET = Path(__file__).resolve().parent.parent / "assets" / "normalize_dicts.json"

with _ASSET.open() as _f:
    _D = json.load(_f)

EXPAND_NOMS: list[list[str]] = _D["expand_noms"]
EXPAND_TITRES: list[list[str]] = _D["expand_titres"]
ABREV_TITRES: list[list[str]] = _D["abrev_titres"]
ABREV_TYPE_VOIE: dict[str, str] = dict(_D["abrev_type_voie"])
SUBSTITUTION_COMPLETE: dict[str, str] = dict(_D["substitution_complete"])
CHIFFRES_ROMAINS: dict[str, str] = dict(_D["chiffres_romains"])

# accent folding map (reference constants.LETTRE_A_LETTRE)
LETTRE_A_LETTRE = {
    "A": ["Â", "À", "Á", "Ã"],
    "C": ["Ç"],
    "E": ["È", "Ê", "É", "Ë"],
    "I": ["Ï", "Î", "Í"],
    "N": ["Ñ"],
    "O": ["Ö", "Ô", "Ò", "Ó"],
    "U": ["Û", "Ü", "Ú"],
    "Y": ["Ÿ"],
    "OE": ["Œ"],
}

# digit → word spelling, applied IN ORDER (single digits first, then words)
CHIFFRES = [
    ["0", "ZERO"],
    ["1", "UN"],
    ["2", "DEUX"],
    ["3", "TROIS"],
    ["4", "QUATRE"],
    ["5", "CINQ"],
    ["6", "SIX"],
    ["7", "SEPT"],
    ["8", "HUIT"],
    ["9", "NEUF"],
    [" DIX NEUF ", " UNNEUF "],
    [" DIX ", " UNZERO "],
    [" ONZE ", " UNUN "],
    [" DOUZE ", " UNDEUX "],
    [" TREIZE ", " UNTROIS "],
    [" QUATORZE ", " UNQUATRE "],
]

# article removal, sequential str.replace order matters ("DE LA" before "DE")
MOT_A_BLANC = ["DE LA", "DU", "DES", "LE", "LA", "LES", "DE", "D", "L"]

_SEPARATORS = str.maketrans({"-": " ", ".": " ", "'": " ", "’": " ", "/": " ", ":": " "})


def _nb_parts(s: str) -> int:
    return len(s.split())


def _part_debut(s: str, nb_parts: int) -> str:
    if _nb_parts(s) > nb_parts:
        return " ".join(s.split()[0:nb_parts])
    return ""


def _replace_type_voie(s: str, nb: int) -> str:
    sp = s.split()
    head = " ".join(sp[0:nb])
    tail = " ".join(sp[nb:])
    return ABREV_TYPE_VOIE[head] + " " + tail


@functools.lru_cache(maxsize=262144)
def normalize(s: str) -> str:
    """Canonicalize a street name / caption to its 30-char merge key."""
    s = s.upper()
    s = s.split(" (")[0]
    s = s.translate(_SEPARATORS)
    s = s.replace('"', "")
    s = " ".join(s.split())

    for base, accented in LETTRE_A_LETTRE.items():
        for ch in accented:
            s = s.replace(ch, base)

    # street-type abbreviation: longest matching 4..1-word strict prefix
    found = False
    p = 5
    while not found and p > -1:
        p -= 1
        if _part_debut(s, p) in ABREV_TYPE_VOIE:
            s = _replace_type_voie(s, p)
            found = True

    # ordinals
    s = s.replace(" EME ", "EME ")
    s = s.replace(" 1ERE", " PREMIERE")
    s = s.replace(" 1ER", " PREMIER")

    # digits
    for old, new in CHIFFRES:
        s = s.replace(old, new)

    # name / title expansion + abbreviation (three passes, same quirky
    # end-of-string handling as the reference: endswith triggers a global
    # replace of ' '+old)
    for table in (EXPAND_NOMS, EXPAND_TITRES, ABREV_TITRES):
        for old, new in table:
            s = s.replace(" " + old + " ", " " + new + " ")
            if s[-len(old):] == old:
                s = s.replace(" " + old, " " + new)

    # articles
    for c in MOT_A_BLANC:
        s = s.replace(" " + c + " ", " ")

    # roman numeral as last word (dict keys carry the reference's literal
    # whitespace quirks, so some keys are unreachable — intentional)
    sp = s.split()
    if sp and sp[-1] in CHIFFRES_ROMAINS:
        sp[-1] = CHIFFRES_ROMAINS[sp[-1]]
        s = " ".join(sp)

    if s in SUBSTITUTION_COMPLETE:
        s = SUBSTITUTION_COMPLETE[s]
    return s[0:30]


def normalize_registry_key(name: str) -> str:
    """Registry-side key: pre-collapse '-' to spaces before normalize
    (reference ``bano/sources/fantoir.py:31-33``)."""
    return normalize(" ".join(name.replace("-", " ").split()))


def normalize_array(values) -> np.ndarray:
    """Vectorized normalize over an array-like of strings.

    Computes the scalar rewrite once per unique value and broadcasts —
    street-name cardinality is far below row count in every real batch.
    Nulls map to empty string.
    """
    arr = np.asarray(values, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=object)
    # null-safe: None must become '' BEFORE the U-cast (astype('U') would
    # stringify None as 'None')
    arr = np.where(arr == None, "", arr)  # noqa: E711 — elementwise None test
    # hash-based factorize: no sort and no fixed-width 'U' copy (np.unique
    # paid an O(n·maxlen) unicode cast plus an argsort — ~0.8 us/row on the
    # flagship chain's 150k-row batches; factorize is ~4x cheaper here)
    import pandas as pd

    # use_na_sentinel=False: nulls were scrubbed above, but if a NaN ever
    # slipped through it must surface in normalize() rather than silently
    # indexing out_uniq[-1] via the default -1 sentinel
    inv, uniq = pd.factorize(arr, use_na_sentinel=False)
    out_uniq = np.array([normalize(u) for u in uniq], dtype=object)
    return out_uniq[inv]
