"""Lieu-dit / place display formatting (reference ``bano/helpers.py:24-76``)."""

from __future__ import annotations

_ACCENTS = {
    "DERRIERE": "DERRIÈRE",
    "EGLISE": "ÉGLISE",
    "ILE": "ÎLE",
    "ILOT": "ÎLOT",
    "PRE": "PRÉ",
}

_LOWER_AFTER_FIRST = {
    "Au": "au", "Aux": "aux", "D": "d'", "De": "de", "Des": "des", "Du": "du",
    "Et": "et", "L": "l'", "La": "la", "Le": "le", "Les": "les",
    "Un": "un", "Une": "une",
}

_APOSTROPHE_FIRST = {"d": "d'", "D": "D'", "l": "l'", "L": "L'"}


def format_toponyme(s: str) -> str:
    parts = s.replace("'", " ").split(" ")
    parts = [_ACCENTS.get(p, p) for p in parts]
    parts = [p.capitalize() for p in parts]
    if len(parts) > 1:
        parts = parts[:1] + [_LOWER_AFTER_FIRST.get(p, p) for p in parts[1:]]
    if parts[0] in _APOSTROPHE_FIRST:
        parts[0] = _APOSTROPHE_FIRST[parts[0]]
    out = " ".join(parts).replace("' ", "'")
    if len(out.strip()) > 1 and out.strip()[-1] == "'":
        out = out.strip()[0:-1]
    return out
