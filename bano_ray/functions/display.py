"""Display-name expansion + BAN ``rep`` promotion.

- :func:`expand_display_name` — M15: the reference's 37-step prefix/infix
  rewrite turning abbreviated street names into display form
  (``bano/sql/export_json_dept_voies_non_rapprochees.sql:66``), vectorized
  as one pass of anchored regex replacements over a pyarrow StringArray.
- :func:`rep_b_as_bis` / :func:`promote_rep` — J4/M11: BAN's single-letter
  ``rep`` is promoted to bis/ter/quater only for (fantoir, numero) pairs
  whose ``b`` has no a/c/d sibling (set built with EXCEPT semantics,
  ``sql/update_table_rep_b_as_bis.sql:1-28``; applied in
  ``bano/sql/ban_hsnr_nocache.sql:10-25``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ordered as in the reference: prefix expansions first, then infix titles,
# then quote cleanup
PREFIX_EXPANSIONS = [
    ("^IMP ", "Impasse "), ("^RTE ", "Route "), ("^ALL ", "Allée "),
    ("^PL ", "Place "), ("^PLA ", "Place "), ("^AV ", "Avenue "),
    ("^LOT ", "Lotissement "), ("^RES ", "Résidence "), ("^CHEM ", "Chemin "),
    ("^RLE ", "Ruelle "), ("^BD ", "Boulevard "), ("^SQ ", "Square "),
    ("^PAS ", "Passage "), ("^SEN ", "Sentier "), ("^CRS ", "Cours "),
    ("^TRA ", "Traverse "), ("^MTE ", "Montée "), ("^RPT ", "Rond-point "),
    ("^HAM ", "Hameau "), ("^VLA ", "Villa "), ("^PROM ", "Promenade "),
    ("^ESP ", "Esplanade "), ("^FG ", "Faubourg "), ("^TSSE ", "Terrasse "),
    ("^CTRE ", "Centre "), ("^PASS ", "Passerelle "), ("^FRM ", "Ferme "),
]
INFIX_EXPANSIONS = [
    (" GAL ", " Général "), (" MAL ", " Maréchal "), (" ST ", " Saint "),
    (" STE ", " Sainte "), (" PDT ", " Président "), (" HT ", " Haut "),
    (" HTE ", " Haute "), (" VX ", " Vieux "), (" PTE ", " Petite "),
]


def expand_display_name(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    s = arr
    for pat, rep in PREFIX_EXPANSIONS:
        s = pc.replace_substring_regex(s, pat, rep)
    for pat, rep in INFIX_EXPANSIONS:
        s = pc.replace_substring(s, pat, rep)
    s = pc.replace_substring(s, '"', "")
    s = pc.replace_substring(s, "’", "'")
    return s


REP_WORDS = {"b": "bis", "t": "ter", "q": "quater"}


def rep_b_as_bis(ban: pd.DataFrame) -> set[tuple[str, str]]:
    """(fantoir, numero) pairs whose rep='b' has no a/c/d sibling."""
    def pairs(rep):
        sub = ban[ban["rep"] == rep]
        return set(zip(sub["id_fantoir"], sub["numero"]))

    return pairs("b") - (pairs("a") | pairs("c") | pairs("d"))


def promote_rep(ban: pd.DataFrame) -> pd.DataFrame:
    """Apply the promotion: rows in the rep_b_as_bis set get rep spelled
    out; everything else keeps the raw letter (reference keeps the letter in
    the housenumber via TRIM(numero || ' ' || rep))."""
    ok = rep_b_as_bis(ban)
    out = ban.copy()
    promoted = [
        REP_WORDS.get(r, r) if (f, n) in ok and r in REP_WORDS else r
        for f, n, r in zip(out["id_fantoir"], out["numero"], out["rep"])
    ]
    out["rep_effective"] = promoted
    out["housenumber"] = [
        f"{n} {r}".strip() if r else str(n)
        for n, r in zip(out["numero"], out["rep_effective"])
    ]
    return out
