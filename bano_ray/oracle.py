"""DuckDB oracle SQL for the driver's correctness gate.

Every SQL string here recomputes, from the registered ``documents`` view and
pure arithmetic, exactly what the corresponding Ray pipeline computes from
the synthesized image table — same hash streams, same template lists, same
reference merge semantics (see ``bano_ray.datagen`` for the single source of
truth; lists are embedded as literals rendered from those constants).

The oracle's GROUPING is independent of ``normalize()``: it identifies
streets by their generative index (``sidx``), so a normalization bug on the
Ray side shows up as a count/hash mismatch.  Only display strings reuse the
normalize output (as literals).
"""

from __future__ import annotations

from . import datagen as dg
from .functions.normalize import normalize

# ---------------------------------------------------------------------------
# literal helpers
# ---------------------------------------------------------------------------


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _slist(strings) -> str:
    return "[" + ", ".join(_q(s) for s in strings) + "]"


def H(k: int) -> str:
    return f"(((doc_id + {dg.STREAM_STEP * k}) * {dg.MULT}) % {dg.MOD})"


FLAT_SPELLINGS = [sp for group in dg.STREET_SPELLINGS + dg.HAMLET_SPELLINGS
                  for sp in group]
# canonical merge key per street group: for hamlet groups (sidx >= NSTREET)
# the BAN spelling carries the tail and is the canonical key; the OSM
# spelling normalizes to the shorter pre-decoration key
NORMS = [normalize(g[0]) for g in dg.STREET_SPELLINGS] + \
        [normalize(g[1]) for g in dg.HAMLET_SPELLINGS]
HAM_OSM_NORMS = [normalize(g[0]) for g in dg.HAMLET_SPELLINGS]

_LON_MAIN = f"(-5.0 + (14.0 * (({H(1)} % 1000000) + 0.5)) / 1000000.0)"
_LAT_MAIN = f"(41.0 + (10.0 * (({H(2)} % 1000000) + 0.5)) / 1000000.0)"
_LON_URBAN = f"({dg.URBAN_LON0} + ({dg.URBAN_SPAN} * (({H(1)} % 1000) + 0.5)) / 1000.0)"
_LAT_URBAN = f"({dg.URBAN_LAT0} + ({dg.URBAN_SPAN} * (({H(2)} % 1000) + 0.5)) / 1000.0)"

_HAM_COND = (f"(doc_id % {dg.HAMLET_MOD} = {dg.HAMLET_RESIDUE}"
             f" AND doc_id % {dg.URBAN_MOD} <> 0)")
_HAM_FAM = f"(({H(13)} % {dg.NHAMLET}) >= {dg.NHAMLET // 2})"
_J = dg.HAM_JITTER
_LON_HAM = (f"((CASE WHEN {_HAM_FAM} THEN {dg.HAM_FAM_LON[1]} ELSE {dg.HAM_FAM_LON[0]} END)"
            f" + (({H(1)} % 1000) + 0.5) / 1000.0 * {2 * _J} - {_J})")
_LAT_HAM = (f"((CASE WHEN {_HAM_FAM} THEN {dg.HAM_FAM_LAT[1]} ELSE {dg.HAM_FAM_LAT[0]} END)"
            f" + (({H(2)} % 1000) + 0.5) / 1000.0 * {2 * _J} - {_J})")

LON_EXPR = (f"(CASE WHEN {_HAM_COND} THEN {_LON_HAM}"
            f" WHEN doc_id % {dg.URBAN_MOD} = 0 THEN {_LON_URBAN}"
            f" ELSE {_LON_MAIN} END)")
LAT_EXPR = (f"(CASE WHEN {_HAM_COND} THEN {_LAT_HAM}"
            f" WHEN doc_id % {dg.URBAN_MOD} = 0 THEN {_LAT_URBAN}"
            f" ELSE {_LAT_MAIN} END)")

SIDX_EXPR = (f"(CASE WHEN {_HAM_COND} THEN {dg.NSTREET} + ({H(13)} % {dg.NHAMLET})"
             f" ELSE ({H(3)} % {dg.NSTREET}) END)")


def base_pts_cte() -> str:
    """The ``pts`` CTE: documents.doc_id → every synthesized column."""
    zx = f"CAST(least(greatest(floor((lon - {dg.LON0}) / {dg.LON_SPAN} * {dg.NZX}), 0), {dg.NZX - 1}) AS BIGINT)"
    zy = f"CAST(least(greatest(floor((lat - {dg.LAT0}) / {dg.LAT_SPAN} * {dg.NZY}), 0), {dg.NZY - 1}) AS BIGINT)"
    return f"""
raw AS (
  SELECT doc_id,
         'img' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS image_id,
         {LON_EXPR} AS lon,
         {LAT_EXPR} AS lat,
         {SIDX_EXPR} AS sidx,
         (doc_id % 4) AS src_idx,
         list_extract({_slist(dg.SOURCES)}, (doc_id % 4) + 1) AS source,
         (CASE WHEN {H(4)} % {dg.HN_EMPTY_MOD} = 0 THEN ''
               ELSE list_extract({_slist(dg.HOUSENUMBERS)}, ({H(4)} % {dg.NHN}) + 1) END) AS hn,
         (CASE WHEN doc_id % {dg.FMT_JPEG_MOD} = 0 THEN 'jpeg' ELSE 'png' END) AS fmt,
         ((CASE WHEN doc_id % {dg.PHASH_DUP_MOD} < 2
                THEN doc_id - (doc_id % {dg.PHASH_DUP_MOD}) ELSE doc_id END)
           * {dg.PHASH_MULT} + 7) % {dg.PHASH_MOD} AS phash,
         ({H(6)} % 3) AS fant_variant,
         ({H(10)} % 16) AS htype_idx,
         (CASE WHEN {H(5)} % {dg.POSTCODE_EMPTY_MOD} = 0 THEN '' ELSE NULL END) AS cp_probe,
         (CASE WHEN {H(9)} % {dg.PSEUDO_MOD} = 0 THEN 'true' ELSE 'false' END) AS pseudo_adresse,
         list_extract({_slist(dg.HIGHWAY_TYPES_GEN)}, ({H(10)} % 16) + 1) AS highway_type
  FROM documents
),
pts AS (
  SELECT raw.*,
         lpad(CAST(({zx} * {dg.NZY} + {zy} + 1) AS VARCHAR), 5, '0') AS insee,
         lpad(CAST((((({zx} * {dg.NZY} + {zy}) + 1) % {dg.NZONES}) + 1) AS VARCHAR), 5, '0') AS insee_next,
         list_extract({_slist(FLAT_SPELLINGS)}, sidx * 4 + src_idx + 1) AS street,
         (CASE WHEN sidx >= {dg.NSTREET} AND src_idx = 0
               THEN list_extract({_slist(HAM_OSM_NORMS)}, sidx - {dg.NSTREET - 1})
               ELSE list_extract({_slist(NORMS)}, sidx + 1) END) AS street_key
  FROM raw
),
pts2 AS (
  SELECT pts.*,
         (CASE WHEN hn = '' THEN street ELSE hn || ', ' || street END) AS caption,
         (CASE WHEN cp_probe = '' THEN ''
               ELSE lpad(CAST(((CAST(substr(insee, 1, 5) AS BIGINT)) * 10) AS VARCHAR), 5, '0') END) AS postcode,
         lpad(CAST(sidx AS VARCHAR), 4, '0') AS voie4,
         (CASE
            WHEN src_idx >= 2 THEN ''
            WHEN src_idx = 1 THEN
              (CASE fant_variant WHEN 0 THEN insee || '_' || lpad(CAST(sidx AS VARCHAR), 4, '0')
                                 WHEN 2 THEN insee_next || '_' || lpad(CAST(sidx AS VARCHAR), 4, '0')
                                 ELSE '' END)
            ELSE
              (CASE fant_variant WHEN 0 THEN insee || lpad(CAST(sidx AS VARCHAR), 4, '0') || 'A'
                                 WHEN 2 THEN insee_next || lpad(CAST(sidx AS VARCHAR), 4, '0') || 'A'
                                 ELSE '' END)
          END) AS fantoir_raw
  FROM pts
)"""


# ---------------------------------------------------------------------------
# Layer-1 query oracles
# ---------------------------------------------------------------------------


def q_parse_caption() -> str:
    return f"""WITH {base_pts_cte()}
SELECT doc_id, caption, hn, street, street_key
FROM pts2 ORDER BY doc_id"""


def q_zone_counts() -> str:
    return f"""WITH {base_pts_cte()}
SELECT insee, COUNT(*) AS n_points
FROM pts2 GROUP BY insee ORDER BY insee"""


def q_cell_counts(res: int = 12) -> str:
    n = 1 << res
    return f"""WITH {base_pts_cte()}
SELECT CAST(floor((lon + 180.0) / 360.0 * {n}.0) AS BIGINT) AS cell_x,
       CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * {n}.0) AS BIGINT) AS cell_y,
       COUNT(*) AS n_points
FROM pts2 GROUP BY 1, 2 ORDER BY 1, 2"""


def q_phash_dups() -> str:
    return f"""WITH {base_pts_cte()}
SELECT phash, COUNT(*) AS n, MIN(image_id) AS keeper
FROM pts2 GROUP BY phash HAVING COUNT(*) > 1 ORDER BY phash"""


def q_phash_neardup() -> str:
    # Mirror of stages/dedup.py phash_neardup: pigeonhole 4 × 12-bit block
    # banding over the 48-bit phash (PHASH_MOD < 2^48 — non-negative, so
    # plain BIGINT arithmetic; no two's-complement shim needed), bucket-size
    # guard [2, 200] on DISTINCT doc_ids, Hamming via popcount of the xor.
    return f"""WITH {base_pts_cte()},
ph_blocks AS (
  SELECT doc_id, phash, d.blk, CAST((phash // d.dv) % 4096 AS BIGINT) AS bv
  FROM pts2 CROSS JOIN (VALUES (0, CAST(1 AS BIGINT)),
                               (1, CAST(4096 AS BIGINT)),
                               (2, CAST(16777216 AS BIGINT)),
                               (3, CAST(68719476736 AS BIGINT))) d(blk, dv)
),
ph_ok AS (
  SELECT blk, bv FROM ph_blocks GROUP BY 1, 2
  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 200
),
ph_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
  FROM ph_blocks x
  JOIN ph_blocks y ON y.blk = x.blk AND y.bv = x.bv AND y.doc_id > x.doc_id
  JOIN ph_ok o ON o.blk = x.blk AND o.bv = x.bv
)
SELECT a, b, hamming FROM ph_pairs WHERE hamming <= 3 ORDER BY a, b"""


def q_hn_canon() -> str:
    # reference bano/sql/export_csv_dept.sql:8
    return f"""WITH {base_pts_cte()}
SELECT doc_id,
       replace(replace(replace(replace(replace(replace(replace(replace(
         regexp_replace(upper(hn), '^0*', ''),
         'BIS','B'),'TER','T'),'QUATER','Q'),'QUAT','Q'),' ',''),'à','-'),';',','),'"','') AS canon
FROM pts2 WHERE hn <> '' ORDER BY doc_id"""


def q_hn_explode() -> str:
    # reference bano/core.py:141-156 (OSM multi-number split)
    return f"""WITH {base_pts_cte()}
SELECT doc_id, trim(part) AS numero
FROM (
  SELECT doc_id, unnest(string_split(translate(hn, ',à;-/*', '$$$$$$'), '$')) AS part
  FROM pts2 WHERE source = 'OSM' AND hn <> ''
) ORDER BY doc_id, numero"""


def q_hn_ranges() -> str:
    # reference out/banout.sh:8-30: ';à,' always split; '-' only ascending
    return f"""WITH {base_pts_cte()},
split1 AS (
  SELECT doc_id, trim(unnest(string_split(translate(hn, ';à', ',,'), ','))) AS part
  FROM pts2 WHERE hn <> ''
),
flagged AS (
  SELECT doc_id, part,
         string_split(part, '-') AS dash_parts,
         (CASE WHEN instr(part, '-') > 0 AND
               CAST('0' || regexp_replace(list_extract(string_split(part,'-'), 1), '[^0-9]', '', 'g') AS BIGINT)
             < CAST('0' || regexp_replace(coalesce(list_extract(string_split(part,'-'), 2), ''), '[^0-9]', '', 'g') AS BIGINT)
          THEN true ELSE false END) AS do_split
  FROM split1
)
SELECT doc_id, trim(p) AS numero
FROM (
  SELECT doc_id, unnest(dash_parts) AS p FROM flagged WHERE do_split
  UNION ALL
  SELECT doc_id, part FROM flagged WHERE NOT do_split
) ORDER BY doc_id, numero"""


def q_hn_plausible() -> str:
    # reference bano/sql/export_csv_dept.sql:92-94
    return f"""WITH {base_pts_cte()}
SELECT doc_id, hn
FROM pts2
WHERE hn <> '' AND regexp_matches(hn, '^[0-9]{{1,4}}( ?[A-Z]?.*)?')
  AND hn <> '99999' AND NOT regexp_matches(hn, '.[0-9 .-]{{9,}}')
ORDER BY doc_id"""


def q_fixed_width_parse() -> str:
    """S4: FANTOIR fixed-width slicing, applied to a synthesized 120-char
    record built from pts (exercises utf8 slicing parity)."""
    return f"""WITH {base_pts_cte()},
recs AS (
  SELECT doc_id, rpad(insee || lpad(CAST(sidx AS VARCHAR), 4, '0') || 'A' || upper(street_key), 120, ' ') AS rec
  FROM pts2
)
SELECT doc_id,
       substr(rec, 1, 5) AS code_insee,
       substr(rec, 6, 4) AS id_voie,
       substr(rec, 10, 1) AS cle_rivoli,
       trim(substr(rec, 11, 30)) AS libelle
FROM recs ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# Layer-2: the per-zone merge (reference addr_2_db, closed-form over the
# generative structure — street identity is sidx, NOT the normalize output,
# so the oracle checks the Ray merge independently)
# ---------------------------------------------------------------------------

_SPELL0 = f"list_extract({_slist(FLAT_SPELLINGS)}, sidx * 4 + 1)"
_KEY = f"list_extract({_slist(NORMS)}, sidx + 1)"
_CODE = "insee || lpad(CAST(sidx AS VARCHAR), 4, '0') || 'A'"

# --- suffix-zone (hamlet) decoration -------------------------------------
# Exact SQL replica of the reference pre_process_suffixe flow over the
# synthesized world: distinct BAN street keys per zone → 1/2-word tail
# frequency (>5, two-word tails block their component words, digits
# excluded) → ≤2 lowest-doc_id BAN address sample points per member street
# → union-of-circles membership (Euclidean degrees, r = 3e-4) → first
# (alphabetically smallest) matching hamlet per OSM highway point.

_SFX_R2 = repr(0.0003 ** 2)


def _suffix_ctes() -> str:
    last1 = "list_extract(w, len(w))"
    last2 = "list_extract(w, len(w) - 1) || ' ' || list_extract(w, len(w))"
    return f"""sfx_keys AS (
  SELECT DISTINCT insee, street_key FROM pts2 WHERE source = 'BAN'
),
sfx_kw AS (
  SELECT insee, street_key, string_split(street_key, ' ') AS w FROM sfx_keys
),
sfx_t AS (
  SELECT insee, street_key, {last2} AS tail, 2 AS nw FROM sfx_kw WHERE len(w) > 4
  UNION ALL
  SELECT insee, street_key, {last1} AS tail, 1 AS nw FROM sfx_kw WHERE len(w) > 3
),
sfx_sel2 AS (
  SELECT insee, tail FROM sfx_t WHERE nw = 2 GROUP BY 1, 2 HAVING COUNT(*) > 5
),
sfx_blocked AS (
  SELECT DISTINCT insee, unnest(string_split(tail, ' ')) AS word FROM sfx_sel2
),
sfx_sel1 AS (
  SELECT insee, tail FROM sfx_t
  WHERE nw = 1 AND NOT regexp_matches(tail, '^[0-9]+$')
  GROUP BY 1, 2 HAVING COUNT(*) > 5
),
sfx_sel AS (
  SELECT insee, tail FROM sfx_sel2
  UNION ALL
  SELECT s.insee, s.tail FROM sfx_sel1 s
  WHERE NOT EXISTS (SELECT 1 FROM sfx_blocked b
                    WHERE b.insee = s.insee AND b.word = s.tail)
),
sfx_members AS (
  SELECT s.insee, s.tail AS hamlet, t.street_key
  FROM sfx_sel s JOIN sfx_t t ON t.insee = s.insee AND t.tail = s.tail
),
sfx_samples AS (
  SELECT insee, street_key, lon, lat FROM (
    SELECT insee, street_key, lon, lat,
           row_number() OVER (PARTITION BY insee, street_key ORDER BY doc_id) AS rn
    FROM pts2 WHERE source = 'BAN' AND hn <> '' AND length(hn) <= 11)
  WHERE rn <= 2
),
sfx_centers AS (
  SELECT m.insee, m.hamlet, s.lon, s.lat
  FROM sfx_members m JOIN sfx_samples s
    ON s.insee = m.insee AND s.street_key = m.street_key
),
sfx AS (
  SELECT p.doc_id, MIN(c.hamlet) AS suffixe
  FROM pts2 p JOIN sfx_centers c ON c.insee = p.insee
   AND (p.lon - c.lon) * (p.lon - c.lon)
     + (p.lat - c.lat) * (p.lat - c.lat) <= {_SFX_R2}
  WHERE p.source = 'OSM' AND p.hn = ''
  GROUP BY p.doc_id
)"""


# an OSM row is decorated when it is a highway point (hn = '') inside a
# suffix zone — exactly the rows the sfx CTE resolves
_DECORATED = "EXISTS (SELECT 1 FROM sfx WHERE sfx.doc_id = pts2.doc_id)"


# --- G5 street labels (point_par_rue) --------------------------------------
# The label table is closed-form over datagen's way grid, so the oracle
# carries it as a literal CTE.  The geometry below mirrors the engine's
# street_label_point op-for-op in float64 (vertex-centroid via np.mean,
# segment projection, argmin snap) so the embedded doubles are bit-identical
# to the Ray side; repr() round-trips them exactly through DuckDB's parser.

WAYONLY_NORMS = [normalize(g[0]) for g in dg.WAYONLY_SPELLINGS]
WAYONLY_SPELL0 = [g[0] for g in dg.WAYONLY_SPELLINGS]
# registry membership for any street index (datagen.registry_table)
_REG_PRED = f"(sidx < {dg.K_REG} OR sidx >= {dg.NSTREET_ALL})"


def _label_points() -> list[tuple[str, int, float, float]]:
    import numpy as np

    rows = []
    for z in range(dg.NZONES):
        zi = str(z + 1).zfill(5)
        for s in dg.WAY_SIDX:
            frs = dg.way_fragments(z, s)
            pts = np.vstack(frs)
            cx, cy = float(pts[:, 0].mean()), float(pts[:, 1].mean())
            a = np.vstack([f[:-1] for f in frs])
            b = np.vstack([f[1:] for f in frs])
            d = b - a
            len2 = (d ** 2).sum(axis=1)
            len2 = np.where(len2 == 0, 1e-300, len2)
            t = ((np.array([cx, cy]) - a) * d).sum(axis=1) / len2
            t = np.clip(t, 0.0, 1.0)
            proj = a + t[:, None] * d
            dist2 = ((proj - np.array([cx, cy])) ** 2).sum(axis=1)
            j = int(np.argmin(dist2))
            rows.append((zi, s, float(proj[j, 0]), float(proj[j, 1])))
    return rows


def _lab_ctes() -> str:
    """``lab``: one (commune, street) label row per OSM-bearing commune ×
    way-bearing street — the engine's gated ``street_labels`` pre-pass."""
    vals = ",\n    ".join(f"('{zi}', {s}, {v!r}, {w!r})"
                          for zi, s, v, w in _label_points())
    return f"""lab_all AS (
  SELECT * FROM (VALUES
    {vals}) AS t(insee, sidx, lx, ly)
),
lab_gate AS (SELECT DISTINCT insee FROM pts2 WHERE source = 'OSM'),
lab AS (SELECT a.* FROM lab_all a JOIN lab_gate g USING (insee))"""


# street_key / canonical spelling for ANY street index incl. way-only ones
_KEY_ANY = (f"(CASE WHEN sidx >= {dg.NSTREET_ALL}"
            f" THEN list_extract({{wn}}, sidx - {dg.NSTREET_ALL - 1})"
            f" ELSE list_extract({{nn}}, sidx + 1) END)")
_SPELL0_ANY = (f"(CASE WHEN sidx >= {dg.NSTREET_ALL}"
               f" THEN list_extract({{ws}}, sidx - {dg.NSTREET_ALL - 1})"
               f" ELSE list_extract({{fs}}, sidx * 4 + 1) END)")


def _key_any(prefix: str = "") -> str:
    e = _KEY_ANY.format(wn=_slist(WAYONLY_NORMS), nn=_slist(NORMS))
    return e.replace("sidx", f"{prefix}sidx") if prefix else e


def _spell0_any(prefix: str = "") -> str:
    e = _SPELL0_ANY.format(ws=_slist(WAYONLY_SPELL0), fs=_slist(FLAT_SPELLINGS))
    return e.replace("sidx", f"{prefix}sidx") if prefix else e


def _cumul_ctes() -> str:
    # ``side`` splits a hamlet street group (sidx >= NSTREET) into the
    # decorated/canonical key group (side 0: BAN/BAL/CADASTRE rows plus OSM
    # street rows re-unified by suffix-zone decoration) and the undecorated
    # OSM-key group (side 1: OSM rows whose merge key stays the tail-less
    # OSM normalization — reference core.py only decorates highways, so OSM
    # *address* rows always stay on side 1).
    #
    # ``side = 2`` quarantines NON-hamlet OSM highway points that happen to
    # fall inside a suffix zone: the engine's decorator is geometry-only
    # (stages/suffix.make_suffix_decorator re-keys ANY hn='' OSM point in a
    # zone to normalize(append_suffixe(street, tail))), so such a stray row
    # leaves its canonical street group and forms a tail-appended key group
    # of its own.  That group holds highway rows only (addresses are never
    # decorated), hence emits no cumul_adresses/cumul_voies rows — but its
    # departure must still be mirrored here so the canonical group's
    # highway_index / hw_has_fant / voie_osm no longer count it.
    split = "string_split(translate(p.hn, ',à;-/*', '$$$$$$'), '$')"
    key = (f"(CASE WHEN n.side = 1"
           f" THEN list_extract({_slist(HAM_OSM_NORMS)}, n.sidx - {dg.NSTREET - 1})"
           f" ELSE {_KEY.replace('sidx', 'n.sidx')} END)")
    return f"""{base_pts_cte()},
{_suffix_ctes()},
{_lab_ctes()},
pts3 AS (
  SELECT pts2.*,
         (CASE WHEN sidx >= {dg.NSTREET} AND source = 'OSM'
                    AND NOT ({_DECORATED}) THEN 1
               WHEN sidx < {dg.NSTREET} AND source = 'OSM' AND hn = ''
                    AND ({_DECORATED}) THEN 2
               ELSE 0 END) AS side
  FROM pts2
),
hw AS (
  SELECT insee, sidx, side,
         bool_or(fant_variant = 0) AS hw_has_fant,
         COUNT(*) AS n_hw,
         CAST(COALESCE(SUM(DISTINCT (1 << htype_idx)), 0) AS BIGINT) AS highway_index
  FROM pts3 WHERE source = 'OSM' AND hn = ''
  GROUP BY 1, 2, 3
),
osm_num_all AS (
  SELECT insee, sidx, side, doc_id, lon, lat, postcode, fant_variant,
         trim(part) AS numero, CAST(pi AS BIGINT) AS part_idx
  FROM (
    SELECT p.*, unnest({split}) AS part, generate_subscripts({split}, 1) AS pi
    FROM pts3 p WHERE p.source = 'OSM' AND p.hn <> ''
  )
),
osm_num AS (SELECT * FROM osm_num_all WHERE numero <> '' AND length(numero) <= 11),
osm_addr_fant AS (
  SELECT insee, sidx, side, bool_or(fant_variant = 0) AS af FROM osm_num GROUP BY 1, 2, 3
),
src_num AS (
  SELECT insee, sidx, side, 'OSM' AS source, numero, doc_id, part_idx, lon, lat,
         postcode AS cp FROM osm_num
  UNION ALL
  SELECT insee, sidx, 0, 'BAN', hn, doc_id, 0, lon, lat, postcode FROM pts3
  WHERE source = 'BAN' AND hn <> '' AND length(hn) <= 11
  UNION ALL
  SELECT insee, sidx, 0, 'BAL', hn, doc_id, 0, lon, lat, '' FROM pts3
  WHERE source = 'BAL' AND hn <> '' AND length(hn) <= 11
  UNION ALL
  SELECT insee, sidx, 0, 'CADASTRE', hn, doc_id, 0, lon, lat, '' FROM pts3
  WHERE source = 'CADASTRE' AND pseudo_adresse <> 'true'
    AND hn <> '' AND length(hn) <= 11
),
num_final AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY insee, sidx, side, source, numero
                                 ORDER BY doc_id DESC, part_idx DESC) AS rn
    FROM src_num)
  WHERE rn = 1
),
cumul AS (
  SELECT n.insee,
         substr(n.insee, 1, 2) AS dept,
         n.source,
         {key} AS street_key,
         n.numero, n.lon, n.lat, n.cp AS code_postal,
         (CASE WHEN (CASE WHEN n.source = 'OSM' THEN COALESCE(oaf.af, false)
                          ELSE false END)
                    OR COALESCE(h.hw_has_fant, false)
                    OR n.sidx < {dg.K_REG}
               THEN {_CODE.replace('insee', 'n.insee').replace('sidx', 'n.sidx')}
               ELSE '' END) AS fantoir,
         (CASE WHEN n.source = 'OSM' OR COALESCE(h.n_hw, 0) > 0
                    OR lb.sidx IS NOT NULL
               THEN {_SPELL0.replace('sidx', 'n.sidx')} ELSE '' END) AS voie_osm,
         (CASE WHEN n.sidx < {dg.K_REG}
               THEN {_SPELL0.replace('sidx', 'n.sidx')} ELSE '' END) AS voie_fantoir,
         (CASE WHEN n.source = 'BAL'
               THEN list_extract({_slist(FLAT_SPELLINGS)}, n.sidx * 4 + 3) ELSE '' END) AS voie_bal,
         (CASE WHEN n.source = 'CADASTRE'
               THEN list_extract({_slist(FLAT_SPELLINGS)}, n.sidx * 4 + 4) ELSE '' END) AS voie_cadastre,
         (CASE n.source
               WHEN 'BAN' THEN list_extract({_slist(FLAT_SPELLINGS)}, n.sidx * 4 + 2)
               WHEN 'BAL' THEN list_extract({_slist(FLAT_SPELLINGS)}, n.sidx * 4 + 3)
               WHEN 'CADASTRE' THEN list_extract({_slist(FLAT_SPELLINGS)}, n.sidx * 4 + 4)
               ELSE '' END) AS voie_autre,
         n.sidx, n.side
  FROM num_final n
  LEFT JOIN hw h ON h.insee = n.insee AND h.sidx = n.sidx AND h.side = n.side
  LEFT JOIN osm_addr_fant oaf ON oaf.insee = n.insee AND oaf.sidx = n.sidx
                             AND oaf.side = n.side
  LEFT JOIN lab lb ON lb.insee = n.insee AND lb.sidx = n.sidx AND n.side = 0
),
first_seen AS (
  SELECT insee, sidx, side, numero, MIN(doc_id * 100 + part_idx) AS fs
  FROM osm_num GROUP BY 1, 2, 3, 4
),
label_sel AS (
  SELECT insee, sidx, side, numero FROM (
    SELECT *, row_number() OVER (PARTITION BY insee, sidx, side ORDER BY fs DESC) AS rn
    FROM first_seen)
  WHERE rn = 1
),
cumul_voies AS (
  SELECT c.insee, c.dept, c.source, c.street_key, c.numero,
         COALESCE(lb.lx, c.lon) AS lon, COALESCE(lb.ly, c.lat) AS lat,
         c.code_postal, c.fantoir, c.voie_osm, c.voie_fantoir, c.voie_bal,
         c.voie_cadastre, c.voie_autre, c.sidx, c.side,
         COALESCE(h.highway_index, 0) AS highway_index
  FROM label_sel l
  JOIN cumul c ON c.source = 'OSM' AND c.insee = l.insee AND c.sidx = l.sidx
              AND c.side = l.side AND c.numero = l.numero
  LEFT JOIN hw h ON h.insee = l.insee AND h.sidx = l.sidx AND h.side = l.side
  LEFT JOIN lab lb ON lb.insee = l.insee AND lb.sidx = l.sidx AND l.side = 0
  UNION ALL
  -- label-only voie rows (way streets without OSM numeros in the group,
  -- incl. the way-only J10 population): the point_par_rue load registers
  -- the street after the FANTOIR attach, so voie_fantoir is set only when
  -- addresses/highways had registered it, and the fantoir comes from the
  -- highway tag, the registry fill, or stays ''
  SELECT lb.insee, substr(lb.insee, 1, 2) AS dept, 'OSM' AS source,
         {_key_any('lb.')} AS street_key, '' AS numero,
         lb.lx AS lon, lb.ly AS lat, '' AS code_postal,
         (CASE WHEN COALESCE(h.hw_has_fant, false) OR {_REG_PRED.replace('sidx', 'lb.sidx')}
               THEN {_CODE.replace('insee', 'lb.insee').replace('sidx', 'lb.sidx')}
               ELSE '' END) AS fantoir,
         {_spell0_any('lb.')} AS voie_osm,
         (CASE WHEN lb.sidx < {dg.K_REG}
                    AND EXISTS (SELECT 1 FROM pts3 p WHERE p.source = 'OSM'
                                AND p.insee = lb.insee AND p.sidx = lb.sidx
                                AND p.side = 0)
               THEN list_extract({_slist(FLAT_SPELLINGS)}, lb.sidx * 4 + 1)
               ELSE '' END) AS voie_fantoir,
         '' AS voie_bal, '' AS voie_cadastre, '' AS voie_autre,
         lb.sidx, 0 AS side,
         COALESCE(h.highway_index, 0) AS highway_index
  FROM lab lb
  LEFT JOIN hw h ON h.insee = lb.insee AND h.sidx = lb.sidx AND h.side = 0
  WHERE NOT EXISTS (SELECT 1 FROM osm_num o WHERE o.insee = lb.insee
                    AND o.sidx = lb.sidx AND o.side = 0)
)"""


CUMUL_COLS = ("insee, dept, source, street_key, numero, lon, lat, "
              "code_postal, fantoir, voie_osm, voie_fantoir, voie_bal, "
              "voie_cadastre, voie_autre")


def q_cumul_adresses() -> str:
    return f"""WITH {_cumul_ctes()}
SELECT {CUMUL_COLS} FROM cumul ORDER BY insee, source, street_key, numero"""


def q_cumul_voies() -> str:
    # cumul_voies rows carry no postcode (reference bano/models.py:156:
    # code_postal stays '')
    cols = (CUMUL_COLS.replace("code_postal", "'' AS code_postal")
            .replace("numero", "'' AS numero"))
    return f"""WITH {_cumul_ctes()}
SELECT {cols}, highway_index
FROM cumul_voies ORDER BY insee, street_key, source, fantoir"""


# ---------------------------------------------------------------------------
# Layer-2b: export oracles (reference export_csv_dept.sql /
# export_json_dept_voies_rapprochees.sql semantics, determinized)
# ---------------------------------------------------------------------------

_CANON = ("replace(replace(replace(replace(replace(replace(replace(replace("
          "regexp_replace(upper(numero), '^0*', ''),"
          "'BIS','B'),'TER','T'),'QUATER','Q'),'QUAT','Q'),' ',''),'à','-'),"
          "';',','),'\"','')")


def _zone_of(lon: str, lat: str) -> str:
    zx = f"CAST(least(greatest(floor(({lon} - {dg.LON0}) / {dg.LON_SPAN} * {dg.NZX}), 0), {dg.NZX - 1}) AS BIGINT)"
    zy = f"CAST(least(greatest(floor(({lat} - {dg.LAT0}) / {dg.LAT_SPAN} * {dg.NZY}), 0), {dg.NZY - 1}) AS BIGINT)"
    return f"lpad(CAST(({zx} * {dg.NZY} + {zy} + 1) AS VARCHAR), 5, '0')"


_PLAUS = ("regexp_matches({n}, '^[0-9]{{1,4}}( ?[A-Z]?.*)?') AND {n} <> '99999' "
          "AND NOT regexp_matches({n}, '.[0-9 .-]{{9,}}')")


def _postal_cp(lon: str, lat: str) -> str:
    """G8 nested-postal-polygon fill: inner 'Q' box (1/4 area) wins over the
    zone-wide 'P' box via the smallest-area tie-break."""
    zx = f"least(greatest(floor(({lon} - {dg.LON0}) / {dg.LON_SPAN} * {dg.NZX}), 0), {dg.NZX - 1})"
    zy = f"least(greatest(floor(({lat} - {dg.LAT0}) / {dg.LAT_SPAN} * {dg.NZY}), 0), {dg.NZY - 1})"
    cx = f"({dg.LON0} + {dg.LON_SPAN} * ({zx} + 0.5) / {dg.NZX})"
    cy = f"({dg.LAT0} + {dg.LAT_SPAN} * ({zy} + 0.5) / {dg.NZY})"
    hx = dg.LON_SPAN / (4.0 * dg.NZX)
    hy = dg.LAT_SPAN / (4.0 * dg.NZY)
    inner = (f"(abs({lon} - {cx}) <= {hx!r} AND abs({lat} - {cy}) <= {hy!r})")
    return (f"(CASE WHEN {inner} THEN 'Q' ELSE 'P' END) || {_zone_of(lon, lat)}")


def q_export_csv() -> str:
    slice_tpl = """(SELECT * FROM (
      SELECT *, {canon} AS num,
             row_number() OVER (PARTITION BY fantoir, {canon}
                                ORDER BY numero, lon, lat) AS rn
      FROM cumul WHERE source = '{src}' {extra}) WHERE rn = 1)"""
    o_sl = slice_tpl.format(canon=_CANON, src="OSM", extra="")
    od_sl = slice_tpl.format(canon=_CANON, src="BAL", extra="AND lon <> 0 AND lat <> 0")
    c_sl = slice_tpl.format(canon=_CANON, src="BAN", extra="AND lon <> 0 AND lat <> 0")
    glon = "coalesce(o.lon, od.lon, c2.lon)"
    glat = "coalesce(o.lat, od.lat, c2.lat)"
    plaus = _PLAUS.format(n="numero")
    return f"""WITH {_cumul_ctes()},
canon AS (SELECT *, {_CANON} AS num FROM cumul WHERE fantoir <> ''),
u AS (SELECT insee, fantoir, num FROM canon GROUP BY 1, 2, 3),
o AS {o_sl},
od AS {od_sl},
c2 AS {c_sl},
res AS (
  SELECT u.fantoir || '-' || u.num AS id,
         upper(replace(coalesce(o.numero, od.numero, c2.numero), ' ', '')) AS numero,
         replace(replace(replace(coalesce(
             nullif(replace(o.voie_osm, '’', chr(39)), ''),
             nullif(replace(od.voie_osm, '’', chr(39)), ''),
             nullif(replace(c2.voie_osm, '’', chr(39)), ''),
             nullif(od.voie_autre, ''), nullif(c2.voie_autre, '')),
           '"', chr(39)), ', ', ' '), ',', ' ') AS voie,
         coalesce(nullif(o.code_postal, ''), nullif(c2.code_postal, ''),
                  {_postal_cp(glon, glat)},
                  lpad(CAST(CAST(u.insee AS BIGINT) * 10 AS VARCHAR), 5, '0')) AS code_post,
         'Zone ' || u.insee AS ville,
         (CASE WHEN o.num IS NOT NULL THEN 'OSM'
               WHEN od.num IS NOT NULL AND nullif(od.voie_osm, '') IS NOT NULL
                    AND od.voie_osm <> od.voie_autre THEN 'O+O'
               WHEN od.num IS NOT NULL THEN 'OD'
               WHEN nullif(c2.voie_osm, '') IS NOT NULL THEN 'C+O'
               ELSE 'CAD' END) AS source,
         {glat} AS lat, {glon} AS lon
  FROM u
  LEFT JOIN o  ON o.fantoir = u.fantoir AND o.num = u.num
  LEFT JOIN od ON od.fantoir = u.fantoir AND od.num = u.num
  LEFT JOIN c2 ON c2.fantoir = u.fantoir AND c2.num = u.num
),
filt AS (
  SELECT * FROM res
  WHERE lat IS NOT NULL AND lon IS NOT NULL AND numero IS NOT NULL
    AND {plaus}
)
SELECT id, numero, voie, code_post, ville, source, lat, lon
FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY numero, lat, lon) AS rn2
      FROM filt)
WHERE rn2 = 1 ORDER BY id"""


def q_export_crosscheck() -> str:
    """stats_export.sh:7-25 replica: per-zone CSV row count, distinct-line
    count, and the shapefile-parity count (pinned equal to n_csv — the
    engine measures it by actually rendering + re-reading the sink)."""
    inner = q_export_csv().replace("ORDER BY id", "")
    rowkey = (" || '|' || ".join(
        f"CAST({c} AS VARCHAR)"
        for c in ["id", "numero", "voie", "code_post", "ville", "source",
                  "lat", "lon"]))
    return f"""WITH export AS ({inner})
SELECT substr(id, 1, 5) AS insee,
       COUNT(*) AS n_csv,
       COUNT(DISTINCT {rowkey}) AS n_unique,
       COUNT(*) AS n_shp
FROM export GROUP BY 1 ORDER BY 1"""


_HAV = ("2.0 * 6371008.8 * asin(sqrt("
        "pow(sin((radians({lat2}) - radians({lat1})) / 2.0), 2)"
        " + cos(radians({lat1})) * cos(radians({lat2}))"
        " * pow(sin((radians({lon2}) - radians({lon1})) / 2.0), 2)))")


def q_street_json() -> str:
    hav = _HAV.format(lat1="p1.lat", lat2="p2.lat", lon1="p1.lon", lon2="p2.lon")
    plaus = _PLAUS.format(n="numero2")
    pop = "(1000 + ((CAST(a.insee AS BIGINT) - 1) * 7919) % 100000)"
    aw = "(1 + (CAST(a.insee AS BIGINT) - 1) % 6)"
    tw = ("(CASE WHEN v.voie_osm LIKE 'Boulevard%' THEN 4"
          " WHEN v.voie_osm LIKE 'Place%' THEN 4"
          " WHEN v.voie_osm LIKE 'Espl%' THEN 4"
          " WHEN v.voie_osm LIKE 'Av%' THEN 3"
          " WHEN v.voie_osm LIKE 'Rue %' THEN 2 ELSE 1 END)")
    return f"""WITH {_cumul_ctes()},
pre AS (
  SELECT *, replace(replace(numero, chr(92), ';'), '"', '') AS numero2,
         (CASE source WHEN 'OSM' THEN 1 WHEN 'BAL' THEN 2 WHEN 'BAN' THEN 3 END) AS sortnum
  FROM cumul WHERE source IN ('OSM', 'BAL', 'BAN') AND fantoir <> ''
),
rnk AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY fantoir, numero2
                                              ORDER BY sortnum, lon, lat) AS rn
                 FROM pre) WHERE rn = 1
),
plaus AS (
  SELECT *, (CASE WHEN code_postal <> '' THEN code_postal
                  ELSE {_postal_cp("lon", "lat")} END) AS cp_eff
  FROM rnk WHERE {plaus}
),
dist AS (
  SELECT p1.fantoir, p1.cp_eff, MAX({hav}) AS d
  FROM plaus p1 JOIN plaus p2 ON p1.fantoir = p2.fantoir AND p1.cp_eff = p2.cp_eff
  GROUP BY 1, 2
),
agg AS (
  SELECT fantoir, cp_eff, insee, COUNT(*) AS cnt,
         string_agg(numero2 || '$' || CAST(lat AS VARCHAR) || '$' || CAST(lon AS VARCHAR),
                    '#' ORDER BY numero2) AS hns
  FROM plaus GROUP BY 1, 2, 3
),
v AS (SELECT * FROM cumul_voies WHERE fantoir <> '')
SELECT a.fantoir,
       a.insee AS citycode,
       replace(replace(replace(v.voie_osm, chr(9), ' '), '"', chr(39)), '’', chr(39)) AS name,
       a.cp_eff AS postcode,
       round(v.lat, 6) AS lat,
       round(v.lon, 6) AS lon,
       'Zone ' || a.insee AS city,
       'Dept ' || substr(a.insee, 1, 2) AS departement,
       'Region ' || substr(a.insee, 1, 2) AS region,
       round(log({aw} + log({pop} + 1) / 3.0)
             * log(1.0 + log(a.cnt + 1) + log(d.d + 1) + log({tw})), 4) AS importance,
       a.hns AS housenumbers,
       a.cnt AS n_adresses
FROM agg a
JOIN v ON v.fantoir = a.fantoir
JOIN dist d ON d.fantoir = a.fantoir AND d.cp_eff = a.cp_eff
ORDER BY a.fantoir, a.cp_eff"""


# ---------------------------------------------------------------------------
# Layer-2c: registry joins, tiles, kNN
# ---------------------------------------------------------------------------


def q_registry_unmatched() -> str:
    return f"""WITH {_cumul_ctes()},
reg AS (
  SELECT lpad(CAST(z.range + 1 AS VARCHAR), 5, '0') AS insee,
         lpad(CAST(z.range + 1 AS VARCHAR), 5, '0')
           || lpad(CAST(s.sidx AS VARCHAR), 4, '0') || 'A' AS fantoir
  FROM range({dg.NZONES}) z,
       (SELECT range AS sidx FROM range({dg.K_REG})
        UNION ALL
        SELECT range AS sidx
        FROM range({dg.NSTREET_ALL}, {dg.NSTREET_ALL + dg.NWAYONLY})) s
),
matched AS (SELECT DISTINCT fantoir FROM cumul_voies WHERE fantoir <> '')
SELECT insee, fantoir FROM reg
WHERE fantoir NOT IN (SELECT fantoir FROM matched)
ORDER BY fantoir"""


def q_voies_sans_adresses() -> str:
    """J10 mirror (reference
    ``export_json_dept_voies_rapprochees_sans_adresses.sql``): cumul_voies
    fantoirs absent from cumul_adresses, enriched with the G8 postal fill,
    the closed-form COG dims and the single-street importance
    (``count(p.*) = 1`` → the ``log(2)`` term)."""
    pop = "(1000 + ((CAST(s.insee AS BIGINT) - 1) * 7919) % 100000)"
    aw = "(1 + (CAST(s.insee AS BIGINT) - 1) % 6)"
    tw = ("(CASE WHEN s.voie_osm LIKE 'Boulevard%' THEN 4"
          " WHEN s.voie_osm LIKE 'Place%' THEN 4"
          " WHEN s.voie_osm LIKE 'Espl%' THEN 4"
          " WHEN s.voie_osm LIKE 'Av%' THEN 3"
          " WHEN s.voie_osm LIKE 'Rue %' THEN 2 ELSE 1 END)")
    return f"""WITH {_cumul_ctes()},
sans AS (
  SELECT * FROM cumul_voies
  WHERE fantoir <> ''
    AND fantoir NOT IN (SELECT fantoir FROM cumul WHERE fantoir <> '')
)
SELECT s.fantoir,
       s.insee AS citycode,
       'street' AS type,
       replace(replace(replace(s.voie_osm, chr(9), ' '), '"', chr(39)), '’', chr(39)) AS name,
       {_postal_cp('s.lon', 's.lat')} AS postcode,
       round(s.lat, 6) AS lat,
       round(s.lon, 6) AS lon,
       'Zone ' || s.insee AS city,
       'Dept ' || substr(s.insee, 1, 2) AS departement,
       'Region ' || substr(s.insee, 1, 2) AS region,
       round(log({aw} + log({pop} + 1) / 3.0)
             * log(1.0 + log(2) + log({tw})), 4) AS importance
FROM sans s
ORDER BY s.fantoir"""


def q_ban_pseudo() -> str:
    return f"""WITH {base_pts_cte()},
b AS (SELECT DISTINCT insee, street_key FROM pts2
      WHERE source = 'BAN' AND sidx >= {dg.K_REG})
SELECT insee, street_key,
       insee || 'b' || rpad(CAST(rn - 1 AS VARCHAR), 4, 'b') AS pseudo_fantoir
FROM (SELECT *, row_number() OVER (PARTITION BY insee ORDER BY street_key) AS rn
      FROM b)
ORDER BY insee, street_key"""


def q_min_cp() -> str:
    return f"""WITH {_cumul_ctes()}
SELECT insee, MIN(code_postal) AS min_cp
FROM cumul WHERE code_postal <> '' GROUP BY insee ORDER BY insee"""


def q_tile_zones() -> str:
    tiles_vals = ", ".join(f"({z}, {x}, {y})" for z, x, y in dg.EXPIRE_TILES)
    m = 20037508.34
    return f"""WITH tiles(z, x, y) AS (VALUES {tiles_vals}),
tb AS (
  SELECT z, x, y,
         -{m} + ({2*m:.2f} / pow(2.0, z)) * x AS mx0,
         -{m} + ({2*m:.2f} / pow(2.0, z)) * (x + 1) AS mx1,
         {m} - ({2*m:.2f} / pow(2.0, z)) * (y + 1) AS my0,
         {m} - ({2*m:.2f} / pow(2.0, z)) * y AS my1
  FROM tiles
),
tl AS (
  SELECT z, x, y,
         mx0 / {m} * 180.0 AS lon0, mx1 / {m} * 180.0 AS lon1,
         degrees(atan((exp(my0 / {m} * pi()) - exp(-(my0 / {m} * pi()))) / 2.0)) AS lat0,
         degrees(atan((exp(my1 / {m} * pi()) - exp(-(my1 / {m} * pi()))) / 2.0)) AS lat1
  FROM tb
),
zones AS (
  SELECT lpad(CAST(r.range + 1 AS VARCHAR), 5, '0') AS insee,
         {dg.LON0} + ({dg.LON_SPAN} * (r.range // {dg.NZY})) / {dg.NZX} AS zx0,
         {dg.LON0} + ({dg.LON_SPAN} * ((r.range // {dg.NZY}) + 1)) / {dg.NZX} AS zx1,
         {dg.LAT0} + ({dg.LAT_SPAN} * (r.range % {dg.NZY})) / {dg.NZY} AS zy0,
         {dg.LAT0} + ({dg.LAT_SPAN} * ((r.range % {dg.NZY}) + 1)) / {dg.NZY} AS zy1
  FROM range({dg.NZONES}) r
)
SELECT CAST(t.z AS BIGINT) AS z, CAST(t.x AS BIGINT) AS x,
       CAST(t.y AS BIGINT) AS y, zo.insee
FROM tl t JOIN zones zo
ON t.lon0 <= zo.zx1 AND t.lon1 >= zo.zx0 AND t.lat0 <= zo.zy1 AND t.lat1 >= zo.zy0
ORDER BY t.z, t.x, t.y, zo.insee"""


def q_tile_zones_arm() -> str:
    """G9 metropolis rule replica: level-8 zones minus the metro parents,
    UNION the level-9 arrondissement boxes (reference bano/models.py:330-360).
    Box geometry literals come from the same datagen constants the engine
    uses; the exclusion + intersection semantics are replicated in SQL."""
    tiles_vals = ", ".join(f"({z}, {x}, {y})" for z, x, y in dg.EXPIRE_TILES)
    parents = ", ".join(f"'{str(zi + 1).zfill(5)}'"
                        for zi in sorted(dg.METRO_ZONES))
    arr_vals = ", ".join(
        f"('{code}', {x0!r}, {x1!r}, {y0!r}, {y1!r})"
        for code, _p, x0, x1, y0, y1 in dg.arrondissement_boxes())
    m = 20037508.34
    return f"""WITH tiles(z, x, y) AS (VALUES {tiles_vals}),
tb AS (
  SELECT z, x, y,
         -{m} + ({2*m:.2f} / pow(2.0, z)) * x AS mx0,
         -{m} + ({2*m:.2f} / pow(2.0, z)) * (x + 1) AS mx1,
         {m} - ({2*m:.2f} / pow(2.0, z)) * (y + 1) AS my0,
         {m} - ({2*m:.2f} / pow(2.0, z)) * y AS my1
  FROM tiles
),
tl AS (
  SELECT z, x, y,
         mx0 / {m} * 180.0 AS lon0, mx1 / {m} * 180.0 AS lon1,
         degrees(atan((exp(my0 / {m} * pi()) - exp(-(my0 / {m} * pi()))) / 2.0)) AS lat0,
         degrees(atan((exp(my1 / {m} * pi()) - exp(-(my1 / {m} * pi()))) / 2.0)) AS lat1
  FROM tb
),
lvl8 AS (
  SELECT lpad(CAST(r.range + 1 AS VARCHAR), 5, '0') AS insee,
         {dg.LON0} + ({dg.LON_SPAN} * (r.range // {dg.NZY})) / {dg.NZX} AS zx0,
         {dg.LON0} + ({dg.LON_SPAN} * ((r.range // {dg.NZY}) + 1)) / {dg.NZX} AS zx1,
         {dg.LAT0} + ({dg.LAT_SPAN} * (r.range % {dg.NZY})) / {dg.NZY} AS zy0,
         {dg.LAT0} + ({dg.LAT_SPAN} * ((r.range % {dg.NZY}) + 1)) / {dg.NZY} AS zy1
  FROM range({dg.NZONES}) r
  WHERE lpad(CAST(r.range + 1 AS VARCHAR), 5, '0') NOT IN ({parents})
),
lvl9(insee, zx0, zx1, zy0, zy1) AS (VALUES {arr_vals}),
zones AS (SELECT * FROM lvl8 UNION ALL SELECT * FROM lvl9)
SELECT CAST(t.z AS BIGINT) AS z, CAST(t.x AS BIGINT) AS x,
       CAST(t.y AS BIGINT) AS y, zo.insee
FROM tl t JOIN zones zo
ON t.lon0 <= zo.zx1 AND t.lon1 >= zo.zx0 AND t.lat0 <= zo.zy1 AND t.lat1 >= zo.zy0
ORDER BY t.z, t.x, t.y, zo.insee"""


def q_commune_list() -> str:
    """J12 replica (reference bano/db_helpers.py:7-15): typecom != 'COMD',
    ARM parents excluded.  The COM/COMD rows are closed-form over the zone
    grid; the ARM rows are literals from the same datagen constants."""
    metros = ", ".join(str(zi) for zi in sorted(dg.METRO_ZONES))
    arm_vals = ", ".join(
        f"('{code}', lpad(CAST({int(parent) - 1} // {dg.NZY} + 1 AS VARCHAR), 2, '0'), "
        f"'ZONE {parent} ARR {code[-2:]}', 'ARM', '{parent}')"
        for code, parent, *_ in dg.arrondissement_boxes())
    return f"""WITH com AS (
  SELECT lpad(CAST(r.range + 1 AS VARCHAR), 5, '0') AS com,
         lpad(CAST(r.range // {dg.NZY} + 1 AS VARCHAR), 2, '0') AS dep,
         'ZONE ' || lpad(CAST(r.range + 1 AS VARCHAR), 5, '0') AS ncc,
         'COM' AS typecom, '' AS comparent
  FROM range({dg.NZONES}) r
),
arm(com, dep, ncc, typecom, comparent) AS (VALUES {arm_vals}),
comd AS (
  SELECT '9' || lpad(CAST(r.range + 1 AS VARCHAR), 4, '0') AS com,
         lpad(CAST(r.range // {dg.NZY} + 1 AS VARCHAR), 2, '0') AS dep,
         'ZONE ' || lpad(CAST(r.range + 1 AS VARCHAR), 5, '0') || ' DELEGUEE' AS ncc,
         'COMD' AS typecom,
         lpad(CAST(r.range + 1 AS VARCHAR), 5, '0') AS comparent
  FROM range({dg.NZONES}) r
  WHERE r.range % {dg.COMD_EVERY} = 0 AND r.range NOT IN ({metros})
),
allc AS (SELECT * FROM com UNION ALL SELECT * FROM arm UNION ALL SELECT * FROM comd)
SELECT dep, com, ncc FROM allc
WHERE typecom <> 'COMD'
  AND com NOT IN (SELECT DISTINCT comparent FROM allc WHERE typecom = 'ARM')
ORDER BY com"""


def q_knn_match() -> str:
    hav = _HAV.format(lat1="p.lat", lat2="t.lat", lon1="p.lon", lon2="t.lon")
    return f"""WITH {base_pts_cte()}
SELECT probe_id, target_id, dist_m, CAST(1 AS BIGINT) AS rank
FROM (
  SELECT p.image_id AS probe_id, t.image_id AS target_id,
         round({hav}, 3) AS dist_m,
         row_number() OVER (PARTITION BY p.image_id
                            ORDER BY round({hav}, 6), t.image_id) AS rn
  FROM pts2 p
  JOIN pts2 t ON p.insee = t.insee AND p.street_key = t.street_key
             AND t.source = 'OSM'
  WHERE p.source = 'BAN'
)
WHERE rn = 1 ORDER BY probe_id"""


# ---------------------------------------------------------------------------
# Layer-3: text analysis / dedup / ANN / events / relational baseline
# (over the real testdata tables)
# ---------------------------------------------------------------------------


def _occ(expr: str, pat: str) -> str:
    p = _q(pat)
    return f"CAST((length({expr}) - length(replace({expr}, {p}, ''))) / {len(pat)} AS BIGINT)"


def q_langid() -> str:
    from .stages.text import EN_MARKERS, FR_MARKERS

    en = " + ".join(_occ("lower(text)", p) for p in EN_MARKERS)
    fr = " + ".join(_occ("lower(text)", p) for p in FR_MARKERS)
    return f"""SELECT doc_id, ({en}) AS en_hits, ({fr}) AS fr_hits,
       (CASE WHEN ({en}) > ({fr}) THEN 'en'
             WHEN ({fr}) > ({en}) THEN 'fr' ELSE 'und' END) AS lang_pred
FROM documents ORDER BY doc_id"""


_NTOK = ("(CASE WHEN trim(text, ' \t\n\r') = '' THEN 0 ELSE "
         "length(string_split_regex(trim(text, ' \t\n\r'), '[ \t\n\r]+')) END)")


def q_token_count() -> str:
    return f"""SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id"""


def q_token_bpe() -> str:
    from .stages.text import BPE_PATTERN

    return f"""SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS n_bpe
FROM documents ORDER BY doc_id"""


def q_quality() -> str:
    from .stages.text import EN_MARKERS, FR_MARKERS, PUNCT

    punct = " + ".join(_occ("text", ch) for ch in PUNCT)
    stop = " + ".join(_occ("lower(text)", p) for p in EN_MARKERS + FR_MARKERS)
    return f"""WITH t AS (
  SELECT doc_id, length(text) AS n_chars, {_NTOK} AS n_tokens,
         ({punct}) AS punct, ({stop}) AS stop,
         CAST(length(text) AS DOUBLE) AS nc
  FROM documents
)
SELECT doc_id, n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(CAST(punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE), 6) AS punct_ratio,
       round(CAST(stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS stop_ratio,
       round(ln(nc + 1.0) * 0.25
             + (CAST(stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) * 2.0
                - CAST(punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) * 3.0), 6) AS quality
FROM t ORDER BY doc_id"""


def q_fingerprint() -> str:
    from .stages.text import FP_LEN, FP_MOD, FP_MULTS

    mults = "[" + ", ".join(str(m) for m in FP_MULTS) + "]"
    return f"""SELECT doc_id,
       CAST(COALESCE(list_sum(list_transform(range(least(length(text), {FP_LEN})),
            i -> CAST(unicode(substr(text, i + 1, 1)) AS BIGINT) * list_extract({mults}, i + 1))), 0)
            % {FP_MOD} AS BIGINT) AS fingerprint
FROM documents ORDER BY doc_id"""


def q_dedup_exact_docs() -> str:
    return """SELECT md5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS keeper
FROM documents GROUP BY 1 ORDER BY h"""


def q_events_hourly() -> str:
    return """SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
       round(SUM(value), 6) AS sum_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY 1, 2 ORDER BY user_id, hour"""


def q_lineitem_pricing() -> str:
    return """SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 4) AS sum_qty,
       round(SUM(l_extendedprice), 4) AS sum_price,
       round(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS n
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""


def q_ann_topk() -> str:
    from .pipelines.queries import ANN_K, ANN_QUERY_IDS

    mx = max(ANN_QUERY_IDS) + 1
    return f"""WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < {mx}
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id >= {mx}
),
sims AS (
  SELECT q.qid AS query_id, c.vec_id,
         round(list_inner_product(q.e, c.e)
               / (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.e, c.e))), 6) AS sim
  FROM q, c
)
SELECT query_id, vec_id, sim, rn AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
      FROM sims)
WHERE rn <= {ANN_K} ORDER BY query_id, rank"""


def q_places() -> str:
    """Places (lieux-dits) merge — reference core_place.py cascade with its
    overwrite-by-id quirks, in closed form over the generative structure."""
    from .functions.toponyme import format_toponyme
    from .pipelines.places import LD_LO, LD_HI, PLACE_TYPES

    fmt_cad = [format_toponyme(dg.STREET_SPELLINGS[s][3]) for s in range(LD_LO, LD_HI)]
    osm_names = [dg.STREET_SPELLINGS[s][0] for s in range(LD_LO, LD_HI)]
    norms_band = [normalize(dg.STREET_SPELLINGS[s][0]) for s in range(LD_LO, LD_HI)]
    kreg = dg.K_REG
    pt = f"list_extract({_slist(PLACE_TYPES)}, ({H(13)} % 4) + 1)"
    return f"""WITH {base_pts_cte()},
prow AS (
  SELECT pts2.*, (sidx - {LD_LO} + 1) AS band,
         {pt} AS ptype
  FROM pts2
  WHERE hn = '' AND sidx >= {LD_LO} AND sidx < {LD_HI}
    AND source IN ('CADASTRE', 'OSM')
),
cad_last AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY insee, sidx
                                              ORDER BY doc_id DESC) rn
                 FROM prow WHERE source = 'CADASTRE') WHERE rn = 1
),
osm_last AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY insee, sidx
                                              ORDER BY doc_id DESC) rn
                 FROM prow WHERE source = 'OSM') WHERE rn = 1
),
osm_v0_last AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY insee, sidx
                                              ORDER BY doc_id DESC) rn
                 FROM prow WHERE source = 'OSM' AND fant_variant = 0) WHERE rn = 1
),
osm_inv_last AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY insee, sidx
                                              ORDER BY doc_id DESC) rn
                 FROM prow WHERE source = 'OSM' AND fant_variant <> 0) WHERE rn = 1
),
code AS (SELECT DISTINCT insee, sidx,
                insee || lpad(CAST(sidx AS VARCHAR), 4, '0') || 'A' AS c,
                list_extract({_slist(osm_names)}, sidx - {LD_LO} + 1) AS oname,
                list_extract({_slist(fmt_cad)}, sidx - {LD_LO} + 1) AS cname,
                list_extract({_slist(norms_band)}, sidx - {LD_LO} + 1) AS nkey,
                (CASE WHEN sidx % 2 = 0 THEN '1' ELSE '' END) AS bati
         FROM prow)
-- seeded band (sidx < K_REG): everything attaches to the registry place
SELECT cl.insee, k.c AS place_id, 'CADASTRE' AS source,
       k.cname AS libelle_cadastre,
       (CASE WHEN ol.insee IS NOT NULL THEN k.oname ELSE '' END) AS libelle_osm,
       k.oname AS libelle_fantoir, k.c AS fantoir, k.bati AS ld_bati,
       '' AS ld_osm, cl.lon, cl.lat
FROM cad_last cl JOIN code k ON k.insee = cl.insee AND k.sidx = cl.sidx
LEFT JOIN osm_last ol ON ol.insee = cl.insee AND ol.sidx = cl.sidx
WHERE cl.sidx < {kreg}
UNION ALL
SELECT ol.insee, k.c, 'OSM', '', k.oname, k.oname, k.c, k.bati, ol.ptype,
       ol.lon, ol.lat
FROM osm_last ol JOIN code k ON k.insee = ol.insee AND k.sidx = ol.sidx
WHERE ol.sidx < {kreg}
UNION ALL
-- unseeded band: code-keyed place from valid-code rows
SELECT v.insee, k.c, 'OSM', '', k.oname, '', k.c, '-1', v.ptype, v.lon, v.lat
FROM osm_v0_last v JOIN code k ON k.insee = v.insee AND k.sidx = v.sidx
WHERE v.sidx >= {kreg}
UNION ALL
-- unseeded band: name-keyed place from invalid-code rows (overwrites any
-- cadastre place of the same id — reference add_place quirk)
SELECT i.insee, k.nkey, 'OSM', '', k.oname, '', '', '-1', i.ptype, i.lon, i.lat
FROM osm_inv_last i JOIN code k ON k.insee = i.insee AND k.sidx = i.sidx
WHERE i.sidx >= {kreg}
UNION ALL
-- unseeded cadastre place survives only with no invalid-code OSM rows
SELECT cl.insee, k.nkey, 'CADASTRE', k.cname, '', '', '', '-1', '', cl.lon, cl.lat
FROM cad_last cl JOIN code k ON k.insee = cl.insee AND k.sidx = cl.sidx
LEFT JOIN osm_inv_last i ON i.insee = cl.insee AND i.sidx = cl.sidx
WHERE cl.sidx >= {kreg} AND i.insee IS NULL
ORDER BY 1, 2, 3"""


def q_display_expand() -> str:
    from .functions.display import INFIX_EXPANSIONS, PREFIX_EXPANSIONS

    expr = "voie_osm"
    for pat, rep in PREFIX_EXPANSIONS:
        expr = f"regexp_replace({expr}, {_q(pat)}, {_q(rep)})"
    for pat, rep in INFIX_EXPANSIONS:
        expr = f"replace({expr}, {_q(pat)}, {_q(rep)})"
    expr = f"replace(replace({expr}, '\"', ''), '’', chr(39))"
    return f"""WITH {_cumul_ctes()}
SELECT insee, fantoir, {expr} AS display_name
FROM cumul_voies ORDER BY insee, fantoir"""


def _pbf_coord(col: str) -> str:
    """PBF nanodegree quantization: half-away round to 1e-7 deg units, then
    the reader's exact (granularity·units)/1e9 reconstruction."""
    s = f"({col} * 10000000)"
    u = (f"CAST((CASE WHEN {s} >= 0 THEN floor({s} + 0.5)"
         f" ELSE ceil({s} - 0.5) END) AS BIGINT)")
    return f"(({u} * 100) / 1000000000.0)"


def q_pbf_nodes() -> str:
    return f"""WITH {base_pts_cte()}
SELECT doc_id AS node_id,
       {_pbf_coord('lon')} AS lon,
       {_pbf_coord('lat')} AS lat,
       hn AS addr_housenumber,
       street AS addr_street
FROM pts2 WHERE source = 'OSM' ORDER BY doc_id"""


def q_communes_json() -> str:
    # reference bano/sql/export_json_dept_communes.sql: rank-1 postal code
    # over (ligne_5, cp), zone-center coordinates, communes importance
    # variant with the 0.075 floor
    z = "r.range"
    insee = f"lpad(CAST({z} + 1 AS VARCHAR), 5, '0')"
    cp0 = f"({z} + 1) * 10"
    lon = f"({dg.LON0} + {dg.LON_SPAN} * (({z} // {dg.NZY}) + 0.5) / {dg.NZX})"
    lat = f"({dg.LAT0} + {dg.LAT_SPAN} * (({z} % {dg.NZY}) + 0.5) / {dg.NZY})"
    pop = f"(1000 + ({z} * 7919) % 100000)"
    aw = f"(1 + {z} % 6)"
    return f"""WITH communes AS (
  SELECT {insee} AS insee, {z} AS zone,
         {lon} AS lon, {lat} AS lat, {pop} AS population, {aw} AS adm_weight
  FROM range({dg.NZONES}) r
),
codes_postaux AS (
  SELECT {insee} AS insee, lpad(CAST({cp0} AS VARCHAR), 5, '0') AS cp, '' AS ligne_5
  FROM range({dg.NZONES}) r
  UNION ALL
  SELECT {insee}, lpad(CAST({cp0} + 3 AS VARCHAR), 5, '0'), '' FROM range({dg.NZONES}) r
  UNION ALL
  SELECT {insee}, lpad(CAST({cp0} + 7 AS VARCHAR), 5, '0'), 'CEDEX A' FROM range({dg.NZONES}) r
),
cp1 AS (
  SELECT insee, cp FROM (
    SELECT *, rank() OVER (PARTITION BY insee ORDER BY ligne_5, cp) AS rang
    FROM codes_postaux) WHERE rang = 1
)
SELECT c.insee AS id,
       list_extract({_slist(dg.COMMUNE_TYPES)}, (c.zone % 4) + 1) AS type,
       'Zone ' || c.insee AS name,
       cp1.cp AS postcode,
       round(c.lat, 6) AS lat,
       round(c.lon, 6) AS lon,
       'Zone ' || c.insee AS city,
       'Dept ' || substr(c.insee, 1, 2) AS departement,
       'Region ' || substr(c.insee, 1, 2) AS region,
       CAST(c.population AS BIGINT) AS population,
       CAST(c.adm_weight AS BIGINT) AS adm_weight,
       greatest(0.075, round(log(c.adm_weight + log(c.population + 1) / 3.0), 4)) AS importance
FROM communes c JOIN cp1 ON cp1.insee = c.insee
ORDER BY id"""


def q_suffix_zones() -> str:
    # street_key || ' ' || suffixe == normalize(append_suffixe(street, sfx))
    # for every in-world decoration (pinned by tests/test_datagen.py
    # hamlet-spelling invariants)
    return f"""WITH {base_pts_cte()},
{_suffix_ctes()}
SELECT s.doc_id, p.insee, s.suffixe,
       p.street_key || ' ' || s.suffixe AS street_key
FROM sfx s JOIN pts2 p ON p.doc_id = s.doc_id
ORDER BY s.doc_id"""


def q_source_counts() -> str:
    return f"""WITH {_cumul_ctes()}
SELECT source, COUNT(*) AS n_adresses,
       CAST(SUM(CASE WHEN fantoir <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
FROM cumul GROUP BY source ORDER BY source"""


def q_zone_raster() -> str:
    from .pipelines.queries import RASTER_RES

    n = float(1 << RASTER_RES)
    zx0 = f"({dg.LON0} + ({dg.LON_SPAN} * (r.range // {dg.NZY})) / {dg.NZX})"
    zx1 = f"({dg.LON0} + ({dg.LON_SPAN} * ((r.range // {dg.NZY}) + 1)) / {dg.NZX})"
    zy0 = f"({dg.LAT0} + ({dg.LAT_SPAN} * (r.range % {dg.NZY})) / {dg.NZY})"
    zy1 = f"({dg.LAT0} + ({dg.LAT_SPAN} * ((r.range % {dg.NZY}) + 1)) / {dg.NZY})"

    def mercy(lat):
        return (f"((1.0 - ln(tan(radians({lat})) + 1.0/cos(radians({lat}))) / pi())"
                f" / 2.0 * {n})")

    ax = f"(({zx0} + 180.0) / 360.0 * {n})"
    bx = f"(({zx1} + 180.0) / 360.0 * {n})"
    ay = mercy(zy1)  # y grows southward
    by = mercy(zy0)
    return f"""SELECT lpad(CAST(r.range + 1 AS VARCHAR), 5, '0') AS insee,
       (CAST(floor({bx} - 0.5) AS BIGINT) - CAST(ceil({ax} - 0.5) AS BIGINT) + 1)
     * (CAST(floor({by} - 0.5) AS BIGINT) - CAST(ceil({ay} - 0.5) AS BIGINT) + 1)
       AS n_cells
FROM range({dg.NZONES}) r ORDER BY insee"""


# ---------------------------------------------------------------------------
# Hash-dedup family (minhash / simhash / embedding LSH) — SQL replicas.
# The engine's shingle hash is the upper md5 half little-endian, i.e.
# exactly DuckDB's md5_number_lower(), so signatures (and therefore the
# banded-bucket candidate generation and the exact verify) are
# value-replicable in SQL (stages/dedup.py _token_hashes).
# ---------------------------------------------------------------------------

# Python text.split() semantics over datagen's single-space documents ==
# string_split(text, ' ') (no leading/trailing/double whitespace in the
# corpus; pinned by scripts/parity_check and the datagen generators).
_SIMHASH_SIG = """sh_tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
sh_h AS (SELECT doc_id, md5_number_lower(tok) AS hv FROM sh_tok),
sh_bits AS (
  SELECT doc_id, r.range AS bit,
         SUM(CASE WHEN (hv >> r.range) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM sh_h CROSS JOIN range(64) r GROUP BY 1, 2
),
sh_sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN
                    CASE WHEN bit = 63 THEN -9223372036854775808
                         ELSE (CAST(1 AS BIGINT) << bit) END
                  ELSE 0 END) AS BIGINT) AS simhash
  FROM sh_bits GROUP BY 1
)"""


def q_simhash() -> str:
    return f"""WITH {_SIMHASH_SIG}
SELECT doc_id, simhash FROM sh_sig ORDER BY doc_id"""


def q_simhash_neardup() -> str:
    # pigeonhole 4x16-bit block banding, bucket-size guard [2, 200],
    # Hamming via popcount of the two's-complement xor (== uint64 view)
    return f"""WITH {_SIMHASH_SIG},
sh_u AS (
  SELECT doc_id, simhash,
         CASE WHEN simhash < 0
              THEN CAST(simhash AS HUGEINT) + 18446744073709551616
              ELSE CAST(simhash AS HUGEINT) END AS uh
  FROM sh_sig
),
sh_blocks AS (
  SELECT doc_id, simhash, d.blk, CAST((uh // d.dv) % 65536 AS BIGINT) AS bv
  FROM sh_u CROSS JOIN (VALUES (0, CAST(1 AS HUGEINT)),
                               (1, CAST(65536 AS HUGEINT)),
                               (2, CAST(4294967296 AS HUGEINT)),
                               (3, CAST(281474976710656 AS HUGEINT))) d(blk, dv)
),
sh_ok AS (
  SELECT blk, bv FROM sh_blocks GROUP BY 1, 2
  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 200
),
sh_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
  FROM sh_blocks x
  JOIN sh_blocks y ON y.blk = x.blk AND y.bv = x.bv AND y.doc_id > x.doc_id
  JOIN sh_ok o ON o.blk = x.blk AND o.bv = x.bv
)
SELECT a, b, hamming FROM sh_pairs WHERE hamming <= 3 ORDER BY a, b"""


def q_minhash_pairs() -> str:
    from .stages.dedup import _A, _B, MINHASH_PERMS

    perms = ", ".join(f"({p}, {int(_A[p])}, {int(_B[p])})"
                      for p in range(MINHASH_PERMS))
    return f"""WITH mh_w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
mh_sh AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 3
    THEN list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
    ELSE [array_to_string(w, ' ')] END) AS s
  FROM mh_w
),
mh_h AS (SELECT doc_id, md5_number_lower(s) AS h FROM mh_sh),
mh_perms(p, a, b) AS (VALUES {perms}),
-- numpy uint64 wrap (mod 2^64) before the Mersenne mod, exactly
mh_sig AS (
  SELECT doc_id, p,
         MIN(((CAST(h AS HUGEINT) * a + b) % 18446744073709551616)
             % 2305843009213693951) AS s
  FROM mh_h CROSS JOIN mh_perms GROUP BY 1, 2
),
mh_seg AS (
  SELECT doc_id, p // 4 AS band, string_agg(s, ',' ORDER BY p) AS seg
  FROM mh_sig GROUP BY 1, 2
),
mh_ok AS (
  SELECT band, seg FROM mh_seg GROUP BY 1, 2
  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 200
),
mh_cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM mh_seg x
  JOIN mh_seg y ON y.band = x.band AND y.seg = x.seg AND y.doc_id > x.doc_id
  JOIN mh_ok o ON o.band = x.band AND o.seg = x.seg
),
mh_dh AS (SELECT DISTINCT doc_id, h FROM mh_h),
mh_cnt AS (SELECT doc_id, COUNT(*) AS n FROM mh_dh GROUP BY 1),
mh_inter AS (
  SELECT c.a, c.b, COUNT(*) AS i
  FROM mh_cand c
  JOIN mh_dh x ON x.doc_id = c.a
  JOIN mh_dh y ON y.doc_id = c.b AND y.h = x.h
  GROUP BY 1, 2
),
mh_j AS (
  SELECT c.a AS doc_a, c.b AS doc_b,
         CAST(COALESCE(i.i, 0) AS DOUBLE) / (na.n + nb.n - COALESCE(i.i, 0)) AS jac
  FROM mh_cand c
  JOIN mh_cnt na ON na.doc_id = c.a
  JOIN mh_cnt nb ON nb.doc_id = c.b
  LEFT JOIN mh_inter i ON i.a = c.a AND i.b = c.b
)
SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM mh_j
WHERE jac >= 0.5 ORDER BY doc_a, doc_b"""


def q_crossmodal_corr() -> str:
    """Per-zone image/caption correlation (queries.q_crossmodal_corr):
    x = the q_image_thumbs per-doc total (summed over channels),
    y = the document-text token count, Pearson r via the
    q_corr_by_group moment formula (same double cast order)."""
    thumbs_sql = q_image_thumbs()
    return f"""WITH tmx AS (
  SELECT doc_id, CAST(SUM(thumb_sum) AS BIGINT) AS x
  FROM ({thumbs_sql}) GROUP BY 1
),
{base_pts_cte()},
cm AS (
  SELECT p.insee, t.x, CAST({_NTOK} AS BIGINT) AS y
  FROM tmx t
  JOIN pts2 p ON p.doc_id = t.doc_id
  JOIN documents d ON d.doc_id = t.doc_id
),
m AS (
  SELECT insee,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sx2,
         CAST(SUM(y * y) AS DOUBLE) AS sy2
  FROM cm GROUP BY 1
)
SELECT insee, CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6)
         AS corr
FROM m ORDER BY insee"""


def q_crossmodal_dups() -> str:
    """Cross-modal dup census (queries.q_crossmodal_dups): the
    q_minhash_pairs output with both sides' closed-form phash compared."""
    base = q_minhash_pairs()
    return f"""WITH mp AS (
  SELECT * FROM ({base})
),
ph AS (
  SELECT doc_id,
         ((CASE WHEN doc_id % {dg.PHASH_DUP_MOD} < 2
                THEN doc_id - (doc_id % {dg.PHASH_DUP_MOD}) ELSE doc_id END)
           * {dg.PHASH_MULT} + 7) % {dg.PHASH_MOD} AS phash
  FROM documents
)
SELECT m.doc_a, m.doc_b, m.jaccard,
       pa.phash = pb.phash AS image_match
FROM mp m
JOIN ph pa ON pa.doc_id = m.doc_a
JOIN ph pb ON pb.doc_id = m.doc_b
ORDER BY m.doc_a, m.doc_b"""


def q_dedup_incremental() -> str:
    """Incremental dedup (stages/dedup.incremental_dedup): the
    q_minhash_pairs CTE prefix with CROSS (delta, base) candidates,
    jaccard >= 0.5, per-delta argmax via ROW_NUMBER."""
    from .stages.dedup import DELTA_MOD

    base = q_minhash_pairs()
    head = base.split("mh_cand AS")[0]
    return head + f"""mh_cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM mh_seg x
  JOIN mh_seg y ON y.band = x.band AND y.seg = x.seg
               AND y.doc_id <> x.doc_id
  JOIN mh_ok o ON o.band = x.band AND o.seg = x.seg
  WHERE x.doc_id % {DELTA_MOD} = 0 AND y.doc_id % {DELTA_MOD} <> 0
),
mh_dh AS (SELECT DISTINCT doc_id, h FROM mh_h),
mh_cnt AS (SELECT doc_id, COUNT(*) AS n FROM mh_dh GROUP BY 1),
mh_inter AS (
  SELECT c.a, c.b, COUNT(*) AS i
  FROM mh_cand c
  JOIN mh_dh x ON x.doc_id = c.a
  JOIN mh_dh y ON y.doc_id = c.b AND y.h = x.h
  GROUP BY 1, 2
),
mh_j AS (
  SELECT c.a, c.b,
         CAST(COALESCE(i.i, 0) AS DOUBLE)
           / (na.n + nb.n - COALESCE(i.i, 0)) AS jac
  FROM mh_cand c
  JOIN mh_cnt na ON na.doc_id = c.a
  JOIN mh_cnt nb ON nb.doc_id = c.b
  LEFT JOIN mh_inter i ON i.a = c.a AND i.b = c.b
),
mh_r AS (
  -- rank on the ROUND-6 value: the engine's verify path emits jaccard
  -- rounded to 6 before the per-delta argmax, so ranking unrounded
  -- could flip ties the engine cannot see
  SELECT a, b, jac,
         row_number() OVER (PARTITION BY a
                            ORDER BY round(jac, 6) DESC, b) AS rn
  FROM mh_j WHERE jac >= 0.5
)
SELECT a AS delta_id, b AS dup_of, round(jac, 6) AS jaccard
FROM mh_r WHERE rn = 1 ORDER BY delta_id"""


def q_boilerplate() -> str:
    """Boilerplate census (stages/dedup.boilerplate_census): the minhash
    shingle CTE, distinct (doc, h), per-shingle distinct-doc counts,
    per-doc shared fraction."""
    return """WITH bp_w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
bp_sh AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 3
    THEN list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
    ELSE [array_to_string(w, ' ')] END) AS s
  FROM bp_w
),
bp_dh AS (SELECT DISTINCT doc_id, md5_number_lower(s) AS h FROM bp_sh),
bp_cnt AS (SELECT h, COUNT(*) AS nd FROM bp_dh GROUP BY 1)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       round(CAST(SUM(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / greatest(COUNT(*), 1), 6) AS shared_frac
FROM bp_dh d JOIN bp_cnt c USING (h)
GROUP BY 1 ORDER BY 1"""


def q_dedup_keep_best() -> str:
    """Quality-aware representative (queries.q_dedup_keep_best): the
    q_dup_clusters closure + the q_quality score, argmax per label via
    ROW_NUMBER (quality DESC, node)."""
    from .stages.text import EN_MARKERS, FR_MARKERS, PUNCT

    labels = q_dup_clusters()
    punct = " + ".join(_occ("text", ch) for ch in PUNCT)
    stop = " + ".join(_occ("lower(text)", p) for p in EN_MARKERS + FR_MARKERS)
    return f"""WITH lab AS (
  SELECT * FROM ({labels})
),
kq AS (
  SELECT doc_id,
         round(ln(CAST(length(text) AS DOUBLE) + 1.0) * 0.25
               + (CAST(({stop}) AS DOUBLE)
                    / CAST(greatest({_NTOK}, 1) AS DOUBLE) * 2.0
                  - CAST(({punct}) AS DOUBLE)
                    / CAST(greatest(length(text), 1) AS DOUBLE) * 3.0), 6)
           AS quality
  FROM documents
),
kj AS (
  SELECT l.label, l.node, q.quality,
         row_number() OVER (PARTITION BY l.label
                            ORDER BY q.quality DESC, l.node) AS rn,
         COUNT(*) OVER (PARTITION BY l.label) AS n_members
  FROM lab l JOIN kq q ON q.doc_id = l.node
)
SELECT label, node AS keeper, CAST(n_members AS BIGINT) AS n_members,
       quality AS best_quality
FROM kj WHERE rn = 1 ORDER BY label"""


def q_jaccard_neardup() -> str:
    """Exact-recall prefix-filtered Jaccard near-dup (stages/dedup.py
    jaccard_neardup): per-doc distinct md5 shingle hashes in ascending hash
    order, prefix length floor((1-t)*n)+1, per-prefix-hash buckets capped at
    200 distinct docs, the min/max size filter, then exact Jaccard over
    distinct-hash sets — all in closed form (t = 0.5)."""
    return """WITH jx_w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
jx_sh AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 3
    THEN list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
    ELSE [array_to_string(w, ' ')] END) AS s
  FROM jx_w
),
jx_dh AS (SELECT DISTINCT doc_id, md5_number_lower(s) AS h FROM jx_sh),
jx_cnt AS (SELECT doc_id, COUNT(*) AS n FROM jx_dh GROUP BY 1),
jx_rk AS (
  SELECT d.doc_id, d.h, c.n,
         ROW_NUMBER() OVER (PARTITION BY d.doc_id ORDER BY d.h) - 1 AS r
  FROM jx_dh d JOIN jx_cnt c USING (doc_id)
),
jx_pre AS (
  SELECT doc_id, h, n FROM jx_rk
  WHERE r < FLOOR((1 - 0.5) * n) + 1
),
jx_ok AS (
  SELECT h FROM jx_pre GROUP BY h
  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 200
),
jx_cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM jx_pre x
  JOIN jx_pre y ON y.h = x.h AND y.doc_id > x.doc_id
  JOIN jx_ok o ON o.h = x.h
  WHERE CAST(LEAST(x.n, y.n) AS DOUBLE) >= 0.5 * CAST(GREATEST(x.n, y.n) AS DOUBLE)
),
jx_inter AS (
  SELECT c.a, c.b, COUNT(*) AS i
  FROM jx_cand c
  JOIN jx_dh x ON x.doc_id = c.a
  JOIN jx_dh y ON y.doc_id = c.b AND y.h = x.h
  GROUP BY 1, 2
),
jx_j AS (
  SELECT c.a AS doc_a, c.b AS doc_b,
         CAST(COALESCE(i.i, 0) AS DOUBLE) / (na.n + nb.n - COALESCE(i.i, 0)) AS jac
  FROM jx_cand c
  JOIN jx_cnt na ON na.doc_id = c.a
  JOIN jx_cnt nb ON nb.doc_id = c.b
  LEFT JOIN jx_inter i ON i.a = c.a AND i.b = c.b
)
SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM jx_j
WHERE jac >= 0.5 ORDER BY doc_a, doc_b"""


def q_asof_join() -> str:
    """AS-OF join vs DuckDB's native ASOF JOIN (stages/asof.py): inner
    as-of, right side reduced to one row per (user, ts) keeping MAX(value)
    so equal-timestamp ties are deterministic on both sides."""
    return """WITH asr AS (
  SELECT user_id, ts, MAX(value) AS value
  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
)
SELECT l.event_id, r.ts AS signup_ts, r.value AS rate
FROM events l
ASOF JOIN asr r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id"""


def q_range_join() -> str:
    """Interval range join (stages/rangejoin.py): purchases strictly after
    an error and within 30 min, counted + cents-summed per error.  Inner
    semantics (errors with no purchase in window produce no row); integer
    cents keep the sum order-free."""
    return """WITH rj_p AS (
  SELECT ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
rj_e AS (
  SELECT event_id, ts FROM events WHERE event_type = 'error'
)
SELECT e.event_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(p.cents) AS BIGINT) AS sum_cents
FROM rj_e e
JOIN rj_p p ON p.ts > e.ts AND p.ts <= e.ts + INTERVAL 30 MINUTE
GROUP BY 1 ORDER BY 1"""


def q_hll_registers() -> str:
    """HyperLogLog registers (stages/sketch.py hll_registers): the engine
    hashes str(l_orderkey) with the md5-upper-half = DuckDB
    ``md5_number_lower``; register = low 8 bits, rank = trailing-zero count
    of the remaining 56 bits + 1 (57 when they are all zero).  ``h // 256``
    is the unsigned ``h >> 8`` and already fits BIGINT, so the
    ``(v & -v) - 1`` popcount trailing-zero form replicates bit-for-bit."""
    from .stages.sketch import HLL_M, HLL_P

    return f"""WITH hl_h AS (
  SELECT md5_number_lower(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem
),
hl_v AS (
  SELECT CAST(h % {HLL_M} AS BIGINT) AS register,
         CAST(h // {HLL_M} AS BIGINT) AS v
  FROM hl_h
)
SELECT register,
       MAX(CAST(CASE WHEN v = 0 THEN {64 - HLL_P + 1}
                     ELSE bit_count((v & -v) - 1) + 1 END AS BIGINT)) AS rank
FROM hl_v GROUP BY register ORDER BY register"""


def q_hll_by_group() -> str:
    """Grouped HLL registers (stages/sketch.py hll_group_registers):
    q_hll_registers' rank arithmetic, grouped by event_type."""
    from .stages.sketch import HLL_M, HLL_P

    return f"""WITH hg_h AS (
  SELECT event_type,
         md5_number_lower(CAST(user_id AS VARCHAR)) AS h FROM events
),
hg_v AS (
  SELECT event_type, CAST(h % {HLL_M} AS BIGINT) AS register,
         CAST(h // {HLL_M} AS BIGINT) AS v
  FROM hg_h
)
SELECT event_type, register,
       MAX(CAST(CASE WHEN v = 0 THEN {64 - HLL_P + 1}
                     ELSE bit_count((v & -v) - 1) + 1 END AS BIGINT)) AS rank
FROM hg_v GROUP BY 1, 2 ORDER BY 1, 2"""


def q_dup_clusters() -> str:
    """Transitive closure of the minhash near-dup pairs (stages/graph.py
    connected_components): min reachable id per node via WITH RECURSIVE
    over the exact q_minhash_pairs SQL."""
    inner = q_minhash_pairs()
    return f"""WITH RECURSIVE cc_p AS (
  SELECT doc_a AS a, doc_b AS b FROM ({inner}) mh
),
cc_e AS (
  SELECT a, b FROM cc_p UNION SELECT b, a FROM cc_p
  UNION SELECT a, a FROM cc_p UNION SELECT b, b FROM cc_p
),
cc_r AS (
  SELECT a AS node, b AS r FROM cc_e
  UNION
  SELECT cc_r.node, e.b FROM cc_r JOIN cc_e e ON cc_r.r = e.a
)
SELECT node, MIN(r) AS label FROM cc_r GROUP BY node ORDER BY node"""


def q_distinct_per_group() -> str:
    """Exact per-group distinct count (queries.q_distinct_per_group)."""
    return """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1 ORDER BY 1"""


def q_rollup() -> str:
    """Multi-level rollup (queries.q_rollup): ROLLUP(source, lang)."""
    return """SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP(source, lang)
ORDER BY source NULLS LAST, lang NULLS LAST"""


def q_heavy_hitters() -> str:
    """Exact top-25 users by event count (queries.q_heavy_hitters);
    (n DESC, user_id) order pins the k boundary."""
    return """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1 ORDER BY n DESC, user_id LIMIT 25"""


def q_topk_per_group() -> str:
    """Top-3 users per event_type (queries.q_topk_per_group)."""
    return """SELECT event_type, user_id, n FROM (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY COUNT(*) DESC, user_id) AS rn
  FROM events GROUP BY 1, 2)
WHERE rn <= 3 ORDER BY event_type, n DESC, user_id"""


def q_group_quantiles() -> str:
    """Per-group discrete quantiles of integer cents
    (queries.q_group_quantiles): quantile_disc per event_type."""
    from .pipelines.queries import GROUP_QUANTILE_QS

    parts = [f"SELECT event_type, CAST({q} AS DOUBLE) AS q, "
             f"quantile_disc(CAST(round(value * 100) AS BIGINT), {q}) "
             f"AS value FROM events GROUP BY 1"
             for q in GROUP_QUANTILE_QS]
    return "\nUNION ALL\n".join(parts)


def q_distance_selfjoin() -> str:
    """Distance self-join (stages/spatial.py): identical float64
    (dx² + dy² ≤ r²) predicate on both sides; planar degrees."""
    from .pipelines.queries import DIST_JOIN_RADIUS as R

    return f"""WITH {base_pts_cte()}
SELECT a.doc_id AS a, b.doc_id AS b,
       round(sqrt((a.lon-b.lon)*(a.lon-b.lon)
                  + (a.lat-b.lat)*(a.lat-b.lat)), 6) AS dist
FROM pts2 a JOIN pts2 b ON a.doc_id < b.doc_id
WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
      <= {R * R!r}
ORDER BY 1, 2"""


def q_kmv_overlap() -> str:
    """KMV sketches (stages/sketch.py kmv_minhashes): DISTINCT hash +
    ORDER BY h LIMIT k per side."""
    from .pipelines.queries import KMV_K

    return f"""(SELECT 'a' AS side, h FROM (
   SELECT DISTINCT md5_number_lower(CAST(o_custkey AS VARCHAR)) AS h
   FROM orders) ORDER BY h LIMIT {KMV_K})
UNION ALL
(SELECT 'b' AS side, h FROM (
   SELECT DISTINCT md5_number_lower(CAST(c_custkey AS VARCHAR)) AS h
   FROM customer) ORDER BY h LIMIT {KMV_K})"""


def q_cms_counters() -> str:
    """Count-Min counters (stages/sketch.py cms_counters): the engine's
    row hashes are md5('cms<d>:' || value), so the exact counter table is
    one GROUP BY away."""
    from .stages.sketch import CMS_D, CMS_W

    return f"""WITH cm_d AS (SELECT unnest(range({CMS_D})) AS d),
cm_h AS (
  SELECT d.d AS row,
         CAST(md5_number_lower('cms' || CAST(d.d AS VARCHAR) || ':'
                               || CAST(e.user_id AS VARCHAR))
              % {CMS_W} AS BIGINT) AS bucket
  FROM events e CROSS JOIN cm_d d
)
SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS n
FROM cm_h GROUP BY 1, 2 ORDER BY 1, 2"""


def q_sample_per_group() -> str:
    """Stratified deterministic sample (stages/sketch.py
    hash_sample_per_group): the windowed-SQL twin."""
    return """SELECT event_type, event_id, h FROM (
  SELECT event_type, event_id,
         md5_number_lower(CAST(event_id AS VARCHAR)) AS h,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY md5_number_lower(CAST(event_id AS VARCHAR)),
                                     event_id) AS rn
  FROM events)
WHERE rn <= 20 ORDER BY event_type, h"""


def q_hash_sample() -> str:
    """Deterministic min-hash bounded sample (stages/sketch.py
    hash_sample): the 100 (md5(text), doc_id)-smallest documents."""
    return """SELECT doc_id, md5_number_lower(text) AS h
FROM documents ORDER BY h, doc_id LIMIT 100"""


def q_broadcast_join() -> str:
    """Plain ANSI reference for the broadcast fact-to-dim join
    (queries.q_broadcast_join)."""
    return """SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1 ORDER BY 1"""


def q_zorder_range() -> str:
    """Plain-BETWEEN bbox reference for the morton-range-pruned scan
    (queries.q_zorder_range) — the prune is a superset prefilter, so the
    exact filter equals this."""
    from .pipelines.queries import ZORDER_BBOX

    lon0, lat0, lon1, lat1 = ZORDER_BBOX
    return f"""WITH {base_pts_cte()}
SELECT doc_id, round(lon, 6) AS lon, round(lat, 6) AS lat
FROM pts2
WHERE lon BETWEEN {lon0} AND {lon1} AND lat BETWEEN {lat0} AND {lat1}
ORDER BY doc_id"""


def q_weighted_sample() -> str:
    """Sequential Poisson weighted sample (stages/sketch.py
    weighted_sample): priority = (md5-u64 / 2^64) / n_chars; selection by
    the UNROUNDED priority (bit-identical IEEE division on both sides),
    displayed rounded."""
    return """SELECT doc_id, n_chars, round(q, 9) AS priority FROM (
  SELECT doc_id, n_chars,
         (CAST(md5_number_lower(text) AS DOUBLE) / 18446744073709551616.0)
           / CAST(n_chars AS DOUBLE) AS q
  FROM documents)
ORDER BY q, doc_id LIMIT 100"""


def q_bloom_semijoin() -> str:
    """Bloom-filtered exact semi-join (stages/bloom.py): the Bloom layer is
    bandwidth-only, so the SQL is the plain ANSI semi-join it guarantees."""
    from .pipelines.queries import BLOOM_PRICE_MIN

    return f"""SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_totalprice > {BLOOM_PRICE_MIN})
GROUP BY 1 ORDER BY 1"""


def q_quantiles() -> str:
    """Exact distributed quantiles (stages/quantile.py): discrete-quantile
    semantics — the engine's rank = max(1, ceil(q*n)) IS quantile_disc."""
    from .pipelines.queries import QUANTILE_QS

    parts = [f"SELECT CAST({q} AS DOUBLE) AS q, "
             f"quantile_disc(l_extendedprice, {q}) AS value FROM lineitem"
             for q in QUANTILE_QS]
    return "\nUNION ALL\n".join(parts)


def q_percentile_cont() -> str:
    """Interpolated percentiles: the oracle computes the interpolation
    ITSELF (window row_number → the two bracketing order statistics →
    ``lo + (hi − lo) · frac``) rather than trusting quantile_cont's
    internal float formula, so both sides evaluate the identical double
    expression and the hash gate is exact."""
    from .pipelines.queries import CONT_QS

    qs = ", ".join(f"(CAST({q} AS DOUBLE))" for q in CONT_QS)
    return f"""WITH nn AS (SELECT COUNT(*) AS n FROM lineitem),
ranked AS (
  SELECT l_extendedprice AS x,
         row_number() OVER (ORDER BY l_extendedprice) AS rn
  FROM lineitem),
qs(q) AS (VALUES {qs}),
kf AS (
  SELECT q,
         CAST(floor(q * (n - 1)) AS BIGINT) AS k,
         q * (n - 1) - floor(q * (n - 1)) AS frac,
         n
  FROM qs, nn)
SELECT kf.q AS q,
       lo.x + (hi.x - lo.x) * kf.frac AS value
FROM kf
JOIN ranked lo ON lo.rn = kf.k + 1
JOIN ranked hi ON hi.rn = least(kf.k + 2, kf.n)
ORDER BY q"""


def q_event_paths() -> str:
    """First-8-events path signature per user (see queries.q_event_paths);
    (ts, event_id) totally orders each user's stream on both sides."""
    from .pipelines.queries import PATH_K

    return f"""WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT user_id,
       string_agg(event_type, '|' ORDER BY rn) AS path,
       CAST(COUNT(*) AS BIGINT) AS n8
FROM ranked WHERE rn <= {PATH_K}
GROUP BY user_id"""


def q_tfidf() -> str:
    """Per-doc top-3 TF-IDF terms (stages/text.py tfidf_topk): single-space
    split on both sides; rank by UNROUNDED score desc then term asc (exact
    ties only arise from equal (tf, df), which the term tiebreak settles)."""
    return """WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(nn.n / dft.df) AS raw,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(nn.n / dft.df) DESC, tf.term) AS rn
  FROM tf JOIN dft USING (term) CROSS JOIN nn
)
SELECT doc_id, term, round(raw, 6) AS score, CAST(rn AS BIGINT) AS rn
FROM scored WHERE rn <= 3 ORDER BY doc_id, rn"""


def q_term_postings() -> str:
    """Truncated inverted index (stages/text.py term_postings_topk)."""
    return """WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
ranked AS (
  SELECT term, doc_id, tf,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
  FROM tf
)
SELECT term, doc_id, tf, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 3 ORDER BY term, rn"""


def q_window_funcs() -> str:
    """Per-user window functions (stages/window.py): integer cents so the
    running sum is order-exact; (ts, event_id) makes the order total."""
    return """SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       LAG(CAST(round(value * 100) AS BIGINT)) OVER w AS lag_cents,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS run_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_id"""


def q_sessionize() -> str:
    """Gap-based sessionization (stages/sessions.py): lag-based session
    starts, running-count session ids, per-session aggregates.  Value sums
    are integer cents on both sides so summation order is immaterial."""
    from .stages.sessions import SESSION_GAP_US

    mins = SESSION_GAP_US // 60_000_000
    return f"""WITH se AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
  FROM events
),
sg AS (
  SELECT user_id, ts, cents,
         SUM(CASE WHEN pts IS NULL
                   OR ts - pts > INTERVAL {mins} MINUTE THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM se
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM sg GROUP BY user_id, sid ORDER BY user_id, session_start"""


def q_audio_features() -> str:
    """Windowed audio features (pipelines/flagship.py AudioFeatures): the
    fake PCM16 waveform is integer-hash arithmetic
    (flagship.audio_samples_of), so RMS / zero-crossings / peak per
    AUDIO_WINDOW-sample window replicate exactly — integer sums are exact,
    /512 is a power-of-two division, and sqrt is correctly rounded on both
    sides."""
    from .pipelines.flagship import AUDIO_SAMPLES, AUDIO_WINDOW

    return f"""WITH au_ids AS (
  SELECT doc_id AS audio_id FROM documents
),
au_smp AS (
  SELECT audio_id, i,
         ((audio_id * 1000003 + i * 7919 + 12345) % 2147483648) % 65536 - 32768 AS s
  FROM au_ids
  CROSS JOIN (SELECT unnest(range(0, {AUDIO_SAMPLES})) AS i) t
),
au_win AS (
  SELECT audio_id, i // {AUDIO_WINDOW} AS window_idx, i, s,
         lag(s) OVER (PARTITION BY audio_id, i // {AUDIO_WINDOW} ORDER BY i) AS prev
  FROM au_smp
),
au_feat AS (
  SELECT audio_id, window_idx,
         round(sqrt(CAST(SUM(s * s) AS DOUBLE) / {AUDIO_WINDOW}), 6) AS rms,
         CAST(SUM(CASE WHEN prev IS NOT NULL
                        AND ((s >= 0) <> (prev >= 0)) THEN 1 ELSE 0 END)
              AS BIGINT) AS zero_crossings,
         CAST(MAX(ABS(s)) AS BIGINT) AS peak
  FROM au_win GROUP BY 1, 2
)
SELECT audio_id, window_idx, rms, zero_crossings, peak
FROM au_feat ORDER BY audio_id, window_idx"""


def q_embedding_neardup() -> str:
    """Banded-LSH embedding near-dup: the engine's planted twins, sign
    projections, bucket co-grouping and exact-cosine verify, replicated in
    closed form (stages/dedup.py embedding_neardup, datagen.plant_neardup_batch)."""
    from . import datagen as _dg
    from .stages.ann import lsh_planes
    from .stages.dedup import embedding_neardup  # noqa: F401  (semantics source)

    nbits, nbands, dim = 12, 2, 64
    planes = lsh_planes(dim, nbits * nbands, seed=42)   # (dim, 24)

    def plane_lit(j: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]"

    def band_expr(band: int) -> str:
        terms = [f"(CASE WHEN list_inner_product(e, {plane_lit(band * nbits + i)}) > 0"
                 f" THEN {1 << i} ELSE 0 END)" for i in range(nbits)]
        return "(" + " + ".join(terms) + f" + {band << (nbits + 1)})"

    step14 = _dg.STREAM_STEP * 14
    noise = (f"CAST(((((vec_id * 131 + (i - 1)) + {step14}) * {_dg.MULT})"
             f" % {_dg.MOD} % 2001 - 1000) / 1000.0 * {_dg.NEARDUP_EPS} AS FLOAT)")
    return f"""WITH en_base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
-- planted twins: float32 perturbation of every {_dg.NEARDUP_MOD}-th base vector
-- (double add of two exact-float32 values + cast == float32 add)
en_twins AS (
  SELECT vec_id + {_dg.NEARDUP_OFFSET} AS vec_id,
         list_transform(range(1, {dim + 1}),
                        i -> CAST(CAST(e[i] + {noise} AS FLOAT) AS DOUBLE)) AS e
  FROM en_base WHERE vec_id % {_dg.NEARDUP_MOD} = 0
),
en_all AS (SELECT * FROM en_base UNION ALL SELECT * FROM en_twins),
en_bk AS (
  SELECT vec_id, e, {band_expr(0)} AS bucket FROM en_all
  UNION ALL
  SELECT vec_id, e, {band_expr(1)} AS bucket FROM en_all
),
-- bucket-size guard [2, 4096]: mirrors the engine's max_bucket skew guard
-- (stages/dedup.py embedding_neardup bucket_dups) exactly
en_ok AS (
  SELECT bucket FROM en_bk GROUP BY 1
  HAVING COUNT(DISTINCT vec_id) BETWEEN 2 AND 4096
),
en_pr AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         list_inner_product(x.e, y.e)
           / (sqrt(list_inner_product(x.e, x.e))
              * sqrt(list_inner_product(y.e, y.e))) AS c
  FROM en_bk x JOIN en_bk y ON y.bucket = x.bucket AND y.vec_id > x.vec_id
  JOIN en_ok o ON o.bucket = x.bucket
)
SELECT DISTINCT a, b, round(c, 6) AS cos FROM en_pr
WHERE c >= 0.9 ORDER BY a, b"""


def q_ann_lsh() -> str:
    """LSH-bucketed ANN replica (stages/ann.py lsh_topk with nbits=5,
    nprobe=8): with nprobe >= nbits every query probes its base bucket plus
    ALL single-bit flips, so the probe set is closed-form; per-(query,
    bucket) top-k, global max-dedup and the rounded-sim/vec_id final
    ordering mirror the engine's reduce exactly."""
    from .pipelines.queries import ANN_K, ANN_QUERY_IDS
    from .stages.ann import lsh_planes

    nbits, dim = 5, 64
    planes = lsh_planes(dim, nbits)
    mx = max(ANN_QUERY_IDS) + 1

    def plane_lit(j: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]"

    bexpr = "(" + " + ".join(
        f"(CASE WHEN list_inner_product(e, {plane_lit(i)}) > 0"
        f" THEN {1 << i} ELSE 0 END)" for i in range(nbits)) + ")"
    flips = ", ".join(["(0)"] + [f"({1 << i})" for i in range(nbits)])
    cos = ("list_inner_product(qp.e, cb.e)"
           " / (sqrt(list_inner_product(qp.e, qp.e))"
           " * sqrt(list_inner_product(cb.e, cb.e)))")
    return f"""WITH q AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < {mx}
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id >= {mx}
),
cb AS (SELECT vec_id, e, {bexpr} AS bucket FROM c),
qb AS (SELECT vec_id, e, {bexpr} AS base FROM q),
qprobe AS (
  SELECT DISTINCT vec_id, e, xor(base, f.flip) AS bucket
  FROM qb CROSS JOIN (VALUES {flips}) f(flip)
),
cand AS (
  SELECT qp.vec_id AS query_id, cb.vec_id AS vid, {cos} AS sim,
         row_number() OVER (PARTITION BY qp.vec_id, cb.bucket
                            ORDER BY {cos} DESC, cb.vec_id) AS rb
  FROM qprobe qp JOIN cb ON cb.bucket = qp.bucket
),
dedup AS (
  SELECT query_id, vid AS vec_id, MAX(sim) AS sim
  FROM cand WHERE rb <= {ANN_K} GROUP BY 1, 2
),
fin AS (
  SELECT query_id, vec_id, round(sim, 6) AS sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(sim, 6) DESC, vec_id) AS rank
  FROM dedup
)
SELECT query_id, vec_id, sim, rank FROM fin WHERE rank <= {ANN_K}
ORDER BY query_id, rank"""


def q_tile_overlap() -> str:
    """Zone×tile rectangle-intersection areas (queries.q_tile_overlap):
    zone boxes from the grid formula, tile edges exact integers in
    Mercator tile-unit space, fractional edges via the same
    ln/tan/cos op order as the numpy kernel."""
    from .pipelines.queries import TILE_OVERLAP_Z

    n = float(1 << TILE_OVERLAP_Z)

    def fy(lat: str) -> str:
        return (f"(1.0 - ln(tan(({lat}) * (pi() / 180.0))"
                f" + 1.0 / cos(({lat}) * (pi() / 180.0))) / pi())"
                f" / 2.0 * {n!r}")

    return f"""WITH z AS (
  SELECT zi, lpad(CAST(zi + 1 AS VARCHAR), 5, '0') AS insee,
         ({dg.LON0!r} + {dg.LON_SPAN!r} * (zi // {dg.NZY}) / {dg.NZX}) AS x0,
         ({dg.LON0!r} + {dg.LON_SPAN!r} * ((zi // {dg.NZY}) + 1) / {dg.NZX}) AS x1,
         ({dg.LAT0!r} + {dg.LAT_SPAN!r} * (zi % {dg.NZY}) / {dg.NZY}) AS y0,
         ({dg.LAT0!r} + {dg.LAT_SPAN!r} * ((zi % {dg.NZY}) + 1) / {dg.NZY}) AS y1
  FROM (SELECT UNNEST(generate_series(0, {dg.NZONES - 1})) AS zi)
),
fr AS (
  SELECT insee,
         (x0 + 180.0) / 360.0 * {n!r} AS fx0,
         (x1 + 180.0) / 360.0 * {n!r} AS fx1,
         {fy('y1')} AS fya,
         {fy('y0')} AS fyb
  FROM z
),
tx AS (
  SELECT fr.*, UNNEST(generate_series(
    CAST(floor(fx0) AS BIGINT), CAST(ceil(fx1) AS BIGINT) - 1)) AS tile_x
  FROM fr
),
txy AS (
  SELECT tx.*, UNNEST(generate_series(
    CAST(floor(fya) AS BIGINT), CAST(ceil(fyb) AS BIGINT) - 1)) AS tile_y
  FROM tx
),
ov AS (
  SELECT insee, tile_x, tile_y,
         (least(fx1, tile_x + 1.0) - greatest(fx0, CAST(tile_x AS DOUBLE))) AS w,
         (least(fyb, tile_y + 1.0) - greatest(fya, CAST(tile_y AS DOUBLE))) AS h
  FROM txy
)
SELECT insee, tile_x, tile_y, ROUND(w * h, 9) AS area
FROM ov WHERE w > 0 AND h > 0
ORDER BY insee, tile_x, tile_y"""


def q_geohash() -> str:
    """Geohash encoding (queries.q_geohash / geo/cells.geohash6): the
    30-bit lon-first interleave unrolled as an OR-of-shifts expression,
    base32 chars via substr on the alphabet constant."""
    from .geo.cells import GEOHASH_BITS, GEOHASH_CHARS

    n = float(1 << GEOHASH_BITS)
    terms = []
    for k in range(2 * GEOHASH_BITS):
        src = "ix" if k % 2 == 0 else "iy"
        b = GEOHASH_BITS - 1 - (k // 2 if k % 2 == 0 else (k - 1) // 2)
        p = 2 * GEOHASH_BITS - 1 - k
        terms.append(f"((({src} >> {b}) & 1) << {p})")
    g = " | ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH_CHARS}', CAST(((g >> {25 - 5 * i}) & 31) AS INTEGER) + 1, 1)"
        for i in range(6))
    return f"""WITH {base_pts_cte()},
q AS (
  SELECT doc_id,
         CAST(least(floor((lon + 180.0) / 360.0 * {n!r}), {n - 1!r}) AS BIGINT) AS ix,
         CAST(least(floor((lat + 90.0) / 180.0 * {n!r}), {n - 1!r}) AS BIGINT) AS iy
  FROM pts2
),
m AS (SELECT doc_id, ({g}) AS g FROM q)
SELECT doc_id, ({chars}) AS gh FROM m ORDER BY doc_id"""


def q_lambert93() -> str:
    """Lambert-93 projection (geo/proj.py): identical sin/tan/ln/exp
    chain with the module's pinned double constants as full-precision
    literals; integer-mm output makes the gate tolerance-free."""
    from .geo import proj

    E, N, AF, R0 = proj.E, proj.N, proj.AF, proj.R0
    X0, Y0, LON0 = proj.X0, proj.Y0, proj.LON0
    return f"""WITH {base_pts_cte()},
tr AS (
  SELECT doc_id, radians(lat) AS latr, radians(lon) AS lonr FROM pts2
),
tt AS (
  SELECT doc_id, lonr,
         tan(pi() / 4.0 - latr / 2.0)
           / exp(({E!r} / 2.0)
                 * ln((1.0 - {E!r} * sin(latr)) / (1.0 + {E!r} * sin(latr))))
           AS t
  FROM tr
),
rt AS (
  SELECT doc_id,
         {AF!r} * exp({N!r} * ln(t)) AS r,
         {N!r} * (lonr - {LON0!r}) AS theta
  FROM tt
)
SELECT doc_id,
       CAST(floor(({X0!r} + r * sin(theta)) * 1000.0 + 0.5) AS BIGINT) AS x_mm,
       CAST(floor(({Y0!r} + {R0!r} - r * cos(theta)) * 1000.0 + 0.5) AS BIGINT) AS y_mm
FROM rt ORDER BY doc_id"""


def q_phash_clusters() -> str:
    """Image near-dup cluster sizes: recursive transitive closure over
    the exact q_phash_neardup pair SQL, then a per-label count."""
    inner = q_phash_neardup()
    return f"""WITH RECURSIVE cc_p AS (
  SELECT a, b FROM ({inner}) ph
),
cc_e AS (
  SELECT a, b FROM cc_p UNION SELECT b, a FROM cc_p
  UNION SELECT a, a FROM cc_p UNION SELECT b, b FROM cc_p
),
cc_r AS (
  SELECT a AS node, b AS r FROM cc_e
  UNION
  SELECT cc_r.node, e.b FROM cc_r JOIN cc_e e ON cc_r.r = e.a
),
lab AS (SELECT node, MIN(r) AS label FROM cc_r GROUP BY node)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_images
FROM lab GROUP BY label ORDER BY label"""


def q_pq_codes() -> str:
    """Product-quantization codes (stages/quantize.pq_codes): the
    closed-form codebook embedded as VALUES literals; per (vector,
    subspace) distance² written as the same left-associated 8-term sum
    the numpy kernel accumulates, argmin via (d2, code) row_number."""
    from .stages.quantize import PQ_DIM, pq_centroids

    cents = pq_centroids()
    rows = []
    for s in range(cents.shape[0]):
        for c in range(cents.shape[1]):
            vec = ", ".join(repr(float(x)) for x in cents[s, c])
            rows.append(f"({s}, {c}, [{vec}])")
    vals = ",\n    ".join(rows)
    terms = " + ".join(
        f"((v[s*{PQ_DIM} + {j + 1}] - cv[{j + 1}])"
        f" * (v[s*{PQ_DIM} + {j + 1}] - cv[{j + 1}]))"
        for j in range(PQ_DIM))
    return f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent(s, c, cv) AS (
  VALUES {vals}
),
d AS (
  SELECT vec_id, s, c, ({terms}) AS d2
  FROM e CROSS JOIN cent
),
r AS (
  SELECT vec_id, s, c, d2,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rn
  FROM d
)
SELECT vec_id, CAST(s AS BIGINT) AS sub, CAST(c AS BIGINT) AS code,
       ROUND(d2, 9) AS err
FROM r WHERE rn = 1 ORDER BY vec_id, sub"""


def q_bpe_first_merge() -> str:
    """BPE first-merge census (queries.q_bpe_first_merge): unnest the
    single-space words, one row per adjacent char window via
    unnest(range(len-1)), substr pairs, global count, top-k by
    (c DESC, pair)."""
    from .stages.text import BPE_MERGE_TOPK

    return f"""WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
win AS (
  SELECT w, unnest(range(length(w) - 1)) AS i FROM w WHERE length(w) >= 2
)
SELECT substr(w, CAST(i + 1 AS INTEGER), 2) AS pair,
       CAST(COUNT(*) AS BIGINT) AS c
FROM win GROUP BY 1 ORDER BY c DESC, pair LIMIT {BPE_MERGE_TOPK}"""


def q_matryoshka() -> str:
    """Matryoshka census (stages/quantize.mrl_census_batch): the prefix
    squared-norm chains written left-associated."""
    from .stages.quantize import MRL_PREFIXES

    def chain(k):
        out = "(v[1] * v[1])"
        for i in range(1, k):
            out = f"({out} + (v[{i + 1}] * v[{i + 1}]))"
        return out

    cols = ",\n       ".join(
        f"round({chain(k)}, 6) AS d{k}" for k in MRL_PREFIXES)
    return f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT vec_id,
       {cols}
FROM e ORDER BY vec_id"""


def q_jl_distortion() -> str:
    """JL distortion census (stages/quantize.jl_project_batch): the ±1
    sign matrix baked as explicit left-associated sum chains so the
    double accumulation order matches the engine term-for-term."""
    from .stages.quantize import DIM, JL_DIM, jl_signs

    s = jl_signs()

    def chain(terms):
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return out

    orig = chain([f"(v[{i + 1}] * v[{i + 1}])" for i in range(DIM)])
    ys = []
    for j in range(JL_DIM):
        terms = [(f"v[{i + 1}]" if s[j, i] > 0 else f"(- v[{i + 1}])")
                 for i in range(DIM)]
        ys.append(chain(terms))
    proj = chain([f"(y{j} * y{j})" for j in range(JL_DIM)])
    ydefs = ",\n       ".join(f"{y} AS y{j}" for j, y in enumerate(ys))
    return f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
yy AS (
  SELECT vec_id, {orig} AS orig,
       {ydefs}
  FROM e
)
SELECT vec_id, round(orig, 6) AS orig_sq,
       round(({proj}) / {JL_DIM}.0, 6) AS proj_msq
FROM yy ORDER BY vec_id"""


def q_semantic_dedup() -> str:
    """Semantic dedup (stages/quantize.semantic_dedup): the q_pq_codes
    argmin machinery restricted to the first SD_SUBS subspaces, codes
    packed to the 4-bit-per-subspace bucket, MIN(vec_id)/COUNT per
    bucket."""
    from .stages.quantize import PQ_DIM, SD_SUBS, pq_centroids

    cents = pq_centroids()
    rows = []
    for s in range(SD_SUBS):
        for c in range(cents.shape[1]):
            vec = ", ".join(repr(float(x)) for x in cents[s, c])
            rows.append(f"({s}, {c}, [{vec}])")
    vals = ",\n    ".join(rows)
    terms = " + ".join(
        f"((v[s*{PQ_DIM} + {j + 1}] - cv[{j + 1}])"
        f" * (v[s*{PQ_DIM} + {j + 1}] - cv[{j + 1}]))"
        for j in range(PQ_DIM))
    return f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent(s, c, cv) AS (
  VALUES {vals}
),
d AS (
  SELECT vec_id, s, c, ({terms}) AS d2
  FROM e CROSS JOIN cent
),
r AS (
  SELECT vec_id, s, c,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rn
  FROM d
),
b AS (
  SELECT vec_id, CAST(SUM(c * (1 << (4 * s))) AS BIGINT) AS bucket
  FROM r WHERE rn = 1 GROUP BY 1
)
SELECT bucket, CAST(MIN(vec_id) AS BIGINT) AS keeper,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM b GROUP BY 1 ORDER BY 1"""


def q_pii_redact() -> str:
    """PII scan/redaction (queries.q_pii_redact): the SAME RE2 literals and
    the same every-third-doc plant, as pure SQL."""
    from .stages.text import EMAIL_RE, PHONE_RE, PII_PLANT_SUFFIX

    return f"""WITH aug AS (
  SELECT doc_id, text || CASE WHEN doc_id % 3 = 0
    THEN ' contact user' || CAST(doc_id AS VARCHAR) || '{PII_PLANT_SUFFIX}'
    ELSE '' END AS text
  FROM documents),
r1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS red1
  FROM aug)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(red1, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(regexp_replace(red1, '{PHONE_RE}', '<PHONE>', 'g')) AS BIGINT)
         AS red_len
FROM r1 ORDER BY doc_id"""


def q_dp_counts() -> str:
    """DP noisy counts (queries.q_dp_counts): the same md5-seeded
    inverse-CDF Laplace draw, identical double chain."""
    from .pipelines.queries import DP_EPSILON

    b = 1.0 / DP_EPSILON
    return f"""WITH g AS (
  SELECT event_type, CAST(COUNT(event_id) AS BIGINT) AS n FROM events
  GROUP BY 1
),
u AS (
  SELECT event_type, n,
         CAST(md5_number_lower(event_type) AS DOUBLE)
           / 18446744073709551616.0 - 0.5 AS c
  FROM g
)
SELECT event_type, n,
       round(-{b!r} * sign(c) * ln(1.0 - 2.0 * abs(c)), 6) AS noise,
       round(n + (-{b!r} * sign(c) * ln(1.0 - 2.0 * abs(c))), 6) AS noisy_n
FROM u ORDER BY event_type"""


def q_k_anonymity() -> str:
    """k-anonymity census (queries.q_k_anonymity): the langid expression
    + doc_id%4 + length bucket as the QI, COUNT per QI, count-of-counts."""
    from .pipelines.queries import KANON_K, KANON_LEN_BUCKET
    from .stages.text import EN_MARKERS, FR_MARKERS

    en = " + ".join(_occ("lower(text)", p) for p in EN_MARKERS)
    fr = " + ".join(_occ("lower(text)", p) for p in FR_MARKERS)
    return f"""WITH ka_qi AS (
  SELECT (CASE WHEN ({en}) > ({fr}) THEN 'en'
               WHEN ({fr}) > ({en}) THEN 'fr' ELSE 'und' END) AS lang,
         doc_id % 4 AS source,
         length(text) // {KANON_LEN_BUCKET} AS len_bucket
  FROM documents
),
ka_g AS (
  SELECT lang, source, len_bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM ka_qi GROUP BY 1, 2, 3
)
SELECT n AS qi_size,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(n * COUNT(*) AS BIGINT) AS n_docs,
       n < {KANON_K} AS reidentifiable
FROM ka_g GROUP BY n ORDER BY qi_size"""


def q_watermark() -> str:
    """Greenlist watermark census (stages/text.watermark_batch): adjacent
    token pairs via a positional self-join, md5 parity membership, the
    same left-associated z expression."""
    from .stages.text import WM_GAMMA as G

    return f"""WITH wm_t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
wm_tok AS (
  SELECT doc_id, unnest(w) AS tk,
         CAST(unnest(range(len(w))) AS BIGINT) AS i
  FROM wm_t
),
wm_pr AS (
  SELECT a.doc_id, a.tk AS prev, b.tk AS cur
  FROM wm_tok a JOIN wm_tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
wm_g AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN md5_number_lower(prev || '|' || cur) % 2 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_green
  FROM wm_pr GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(g.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(g.n_green, 0) AS BIGINT) AS n_green,
       round(CASE WHEN COALESCE(g.n_pairs, 0) = 0 THEN 0.0
                  ELSE (g.n_green - {G} * g.n_pairs)
                       / sqrt(g.n_pairs * {G} * (1.0 - {G})) END, 6)
         AS z_score
FROM documents d LEFT JOIN wm_g g USING (doc_id) ORDER BY doc_id"""


def q_filter_funnel() -> str:
    """Curation filter cascade (queries.q_filter_funnel): the langid /
    quality / repetition / pii expressions of their standalone oracles,
    composed into prefix-survival counts; 4 rows via UNION ALL over one
    aggregate."""
    from .stages.text import (EMAIL_RE, EN_MARKERS, FR_MARKERS, PHONE_RE,
                              PII_PLANT_SUFFIX, PUNCT, QF_DUP_MAX,
                              QF_QUALITY_MIN)

    en = " + ".join(_occ("lower(text)", p) for p in EN_MARKERS)
    fr = " + ".join(_occ("lower(text)", p) for p in FR_MARKERS)
    punct = " + ".join(_occ("text", ch) for ch in PUNCT)
    stop = " + ".join(_occ("lower(text)", p) for p in EN_MARKERS + FR_MARKERS)
    return f"""WITH q AS (
  SELECT doc_id, ({en}) AS en_hits, ({fr}) AS fr_hits,
         round(ln(CAST(length(text) AS DOUBLE) + 1.0) * 0.25
               + (CAST(({stop}) AS DOUBLE)
                    / CAST(greatest({_NTOK}, 1) AS DOUBLE) * 2.0
                  - CAST(({punct}) AS DOUBLE)
                    / CAST(greatest(length(text), 1) AS DOUBLE) * 3.0), 6)
           AS quality
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), pt AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
), rep AS (
  SELECT doc_id,
         round(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS dup_frac
  FROM pt GROUP BY 1
),
aug AS (
  SELECT doc_id, text || CASE WHEN doc_id % 3 = 0
    THEN ' contact user' || CAST(doc_id AS VARCHAR) || '{PII_PLANT_SUFFIX}'
    ELSE '' END AS text
  FROM documents),
pii AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{EMAIL_RE}'))
         + len(regexp_extract_all(
             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}')) AS n_pii
  FROM aug),
flags AS (
  SELECT q.en_hits <> q.fr_hits AS f1,
         (q.en_hits <> q.fr_hits) AND q.quality > {QF_QUALITY_MIN} AS f2,
         (q.en_hits <> q.fr_hits) AND q.quality > {QF_QUALITY_MIN}
           AND rep.dup_frac <= {QF_DUP_MAX} AS f3,
         (q.en_hits <> q.fr_hits) AND q.quality > {QF_QUALITY_MIN}
           AND rep.dup_frac <= {QF_DUP_MAX} AND pii.n_pii = 0 AS f4
  FROM q JOIN rep USING (doc_id) JOIN pii USING (doc_id)
),
ks AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
         CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS k2,
         CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS k3,
         CAST(SUM(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS k4
  FROM flags
)
SELECT CAST(0 AS BIGINT) AS stage_idx, 'langid' AS stage,
       n0 AS n_in, k1 AS n_kept, n0 - k1 AS n_dropped FROM ks
UNION ALL SELECT 1, 'quality', k1, k2, k1 - k2 FROM ks
UNION ALL SELECT 2, 'repetition', k2, k3, k2 - k3 FROM ks
UNION ALL SELECT 3, 'pii', k3, k4, k3 - k4 FROM ks
ORDER BY 1"""


def q_group_moments() -> str:
    """Mergeable per-group moments (queries.q_group_moments): exact integer
    count / Σcents / Σcents² per event_type."""
    return """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)
                * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sumsq_cents
FROM events GROUP BY 1 ORDER BY 1"""


def q_delta_upsert() -> str:
    """Delta-upsert (queries.q_delta_upsert): last-wins per key over the
    base ∪ repriced-delta union, as a ROW_NUMBER window."""
    return """WITH u AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(0 AS BIGINT) AS src
  FROM orders
  UNION ALL
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) + 1111,
         CAST(1 AS BIGINT)
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT o_orderkey, cents, src FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY src DESC) AS rn
  FROM u) WHERE rn = 1 ORDER BY o_orderkey"""


def q_repetition() -> str:
    """Repetition signals (queries.q_repetition): single-space split (the
    TF-IDF convention — empties kept), per-(doc, token) counts."""
    return """WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), pt AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
), agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         MAX(c) AS top_c
  FROM pt GROUP BY 1
)
SELECT doc_id, n_tokens, n_distinct,
       round(CAST(top_c AS DOUBLE) / n_tokens, 6) AS top_frac,
       round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_frac
FROM agg ORDER BY doc_id"""


def q_decontaminate() -> str:
    """Decontamination (queries.q_decontaminate): benchmark = the 1/97
    doc_id slice's first-DECON_N-token n-gram; hits = substring containment
    (duplicated benchmark n-grams count once each, like the engine's
    per-n-gram probe loop)."""
    from .stages.text import DECON_MOD, DECON_N

    return f"""WITH bench AS (
  SELECT array_to_string(
           (string_split(text, ' '))[1:{DECON_N}], ' ') AS ng
  FROM documents
  WHERE doc_id % {DECON_MOD} = 0
    AND len(string_split(text, ' ')) >= {DECON_N}
),
hits AS (
  SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM documents d JOIN bench b ON contains(d.text, b.ng)
  GROUP BY 1
)
SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id) ORDER BY doc_id"""


def q_salted_join() -> str:
    """Salted skew join (queries.q_salted_join): the plain inner join the
    salted repartition reproduces."""
    return """WITH f AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 < 7 THEN 1 ELSE o_custkey END AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT f.o_orderkey, f.k, f.cents, c.c_nationkey
FROM f JOIN customer c ON c.c_custkey = f.k
ORDER BY f.o_orderkey"""


def q_events_sliding() -> str:
    """Hopping windows (queries.q_events_sliding): 2h window / 1h hop as a
    UNION ALL of the two hour shifts."""
    return """WITH w AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), e AS (
  SELECT h AS win_start, cents FROM w
  UNION ALL
  SELECT h - INTERVAL 1 HOUR, cents FROM w
)
SELECT win_start, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM e GROUP BY 1 ORDER BY 1"""


def q_pivot() -> str:
    """Pivot (queries.q_pivot): SUM(CASE) per pinned event type."""
    from .pipelines.queries import EVENT_TYPES

    cols = []
    for t in EVENT_TYPES:
        cols.append(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 "
                    f"END) AS BIGINT) AS {t}_n")
        cols.append(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN "
                    f"CAST(round(value * 100) AS BIGINT) ELSE 0 END) "
                    f"AS BIGINT) AS {t}_cents")
    sel = ",\n       ".join(cols)
    return f"""SELECT date_trunc('day', ts) AS day,
       {sel}
FROM events GROUP BY 1 ORDER BY 1"""


def q_window_ranks() -> str:
    """Rank windows (queries.q_window_ranks / stages.window.window_ranks)."""
    return """WITH e AS (
  SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, cents,
       CAST(RANK() OVER (PARTITION BY user_id ORDER BY cents) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY cents) AS BIGINT) AS dense_rnk,
       round(PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY cents), 6) AS pct_rank,
       CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY cents, event_id) AS BIGINT) AS ntile4
FROM e ORDER BY user_id, cents, event_id"""


def q_bigram_lm() -> str:
    """Bigram-LM scoring (queries.q_bigram_lm): the same self-consistent
    bigram MLE — c(w1 w2) over c(w1 at LEFT positions) — in pure SQL."""
    return """WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(len(l) - 1),
                               i -> l[i + 1] || ' ' || l[i + 2])) AS bg
  FROM t WHERE len(l) >= 2
), c2 AS (
  SELECT bg, CAST(COUNT(*) AS DOUBLE) AS c FROM bg GROUP BY 1
), c1 AS (
  SELECT split_part(bg, ' ', 1) AS w, CAST(COUNT(*) AS DOUBLE) AS c
  FROM bg GROUP BY 1
), sc AS (
  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         round(AVG(ln(c2.c / c1.c)), 6) AS avg_logp
  FROM bg b
  JOIN c2 ON b.bg = c2.bg
  JOIN c1 ON split_part(b.bg, ' ', 1) = c1.w
  GROUP BY 1
)
SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
       COALESCE(s.avg_logp, 0.0) AS avg_logp
FROM documents d LEFT JOIN sc s USING (doc_id) ORDER BY doc_id"""


def q_pagerank() -> str:
    """PageRank over the bipartite user<->item click graph
    (queries.q_pagerank / stages/pagerank.pagerank): 3 fixed iterations of
    r'(v) = 0.15/N + 0.85 * SUM r(u)/deg(u), unrolled as CTEs; per-iteration
    ROUND to 10 decimals pins engine == oracle across summation orders."""
    its = []
    prev = "r0"
    for i in (1, 2, 3):
        its.append(f"""c{i} AS (
  SELECT e.dst AS node, SUM(p.r / d.deg) AS s
  FROM edges e JOIN {prev} p ON p.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
), r{i} AS (
  SELECT n.node, ROUND(0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(c.s, 0), 10) AS r
  FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
)""")
        prev = f"r{i}"
    steps = ",\n".join(its)
    return f"""WITH RECURSIVE ev AS (
  SELECT user_id,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 100 AS item
  FROM events
), nu AS (SELECT MAX(user_id) + 1 AS nu FROM ev),
edges AS (
  SELECT user_id AS src, (SELECT nu FROM nu) + item AS dst FROM ev
  UNION ALL
  SELECT (SELECT nu FROM nu) + item AS src, user_id AS dst FROM ev
),
nodes(node) AS (
  SELECT 0 UNION ALL
  SELECT node + 1 FROM nodes WHERE node + 1 < (SELECT nu + 100 FROM nu)
),
deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
nn AS (SELECT CAST(nu + 100 AS DOUBLE) AS n FROM nu),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
{steps}
SELECT CAST(node AS BIGINT) AS node, ROUND(r, 6) AS pagerank FROM r3 ORDER BY node"""


def q_bfs_levels() -> str:
    """Multi-source BFS levels (queries.q_bfs_levels): recursive
    UNION-distinct CTE over the same bipartite edge list — (node, lvl)
    pairs dedupe per iteration so the working set stays nodes×levels;
    MIN(lvl) per node is the hop distance."""
    from .pipelines.queries import BFS_MAX_DEPTH, BFS_SEED_MOD
    from .stages.pagerank import N_ITEMS

    return f"""WITH RECURSIVE ev AS (
  SELECT user_id,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
           % {N_ITEMS} AS item
  FROM events
), nu AS (SELECT MAX(user_id) + 1 AS nu FROM ev),
edges AS (
  SELECT user_id AS src, (SELECT nu FROM nu) + item AS dst FROM ev
  UNION ALL
  SELECT (SELECT nu FROM nu) + item AS src, user_id AS dst FROM ev
),
seeds AS (
  SELECT DISTINCT user_id AS node FROM ev
  WHERE user_id % {BFS_SEED_MOD} = 0
),
bfs(node, lvl) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, b.lvl + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.lvl < {BFS_MAX_DEPTH}
)
SELECT node, CAST(MIN(lvl) AS BIGINT) AS lvl
FROM bfs GROUP BY node ORDER BY node"""


def q_fuzzy_streets() -> str:
    """Blocked fuzzy street-key pairs (queries.q_fuzzy_streets /
    stages/fuzzy.py): distinct normalized street keys, 4-char-prefix
    blocking, |len diff| <= 5, DuckDB levenshtein() <= 5 — the same block
    rule and exact unit-cost edit distance as the engine's vectorized
    Wagner-Fischer pass."""
    return f"""WITH {base_pts_cte()},
ks AS (SELECT DISTINCT street_key AS k FROM pts2 WHERE street_key IS NOT NULL)
SELECT a.k AS a, b.k AS b, CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
FROM ks a JOIN ks b
  ON substr(a.k, 1, 4) = substr(b.k, 1, 4) AND a.k < b.k
WHERE abs(length(a.k) - length(b.k)) <= 5
  AND levenshtein(a.k, b.k) <= 5
ORDER BY a, b"""


def q_group_outliers() -> str:
    """Per-group z-score outliers (queries.q_group_outliers): flag iff
    (n·x − S)² > 4·(n·S2 − S²) with every operand cast to DOUBLE in the
    SAME order as the engine's numpy expression — identical IEEE rounding
    on both sides, so no float tolerance is needed."""
    return """WITH m AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS s,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS s2
  FROM events GROUP BY 1
), r AS (
  SELECT e.event_id, e.event_type,
         CAST(round(e.value * 100) AS BIGINT) AS cents,
         m.n, m.s, m.s2
  FROM events e JOIN m USING (event_type)
)
SELECT event_id, event_type, cents
FROM r
WHERE (n * CAST(cents AS DOUBLE) - s) * (n * CAST(cents AS DOUBLE) - s)
      > 4.0 * (n * s2 - s * s)
ORDER BY event_id"""


def q_outer_join() -> str:
    """Full outer join of two aggregate streams (queries.q_outer_join):
    orders by o_custkey vs events by user_id*11, plain SQL FULL OUTER."""
    return """WITH a AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders GROUP BY 1
), b AS (
  SELECT user_id * 11 AS key, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1
)
SELECT COALESCE(a.key, b.key) AS key, n_orders, total_cents,
       n_events, value_cents
FROM a FULL OUTER JOIN b ON a.key = b.key
ORDER BY 1"""


def q_train_split() -> str:
    """Deterministic split counts (queries.q_train_split): same
    md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 assignment."""
    return """WITH s AS (
  SELECT lang,
         CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 80
              THEN 'train'
              WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90
              THEN 'val' ELSE 'test' END AS split
  FROM documents)
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s GROUP BY 1, 2 ORDER BY 1, 2"""


def q_char_entropy() -> str:
    """Per-doc character entropy (queries.q_char_entropy /
    stages/text.char_entropy_batch): H = log2(n) − Σ c·log2(c)/n over
    exact per-char counts, rounded to 6."""
    return """WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
), cc AS (
  SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS n FROM ch GROUP BY 1, 2
), tot AS (
  SELECT doc_id, SUM(n) AS t, SUM(n * log2(n)) AS slc FROM cc GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(round(log2(t) - slc / t, 6), 0.0) AS entropy
FROM documents d LEFT JOIN tot ON d.doc_id = tot.doc_id
ORDER BY d.doc_id"""


def q_cube() -> str:
    """CUBE(source, lang) (queries.q_cube)."""
    return """SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY CUBE(source, lang)
ORDER BY source NULLS LAST, lang NULLS LAST"""


def q_histogram() -> str:
    """Fixed-bin order-total histogram (queries.q_histogram): $25k bins
    over exact cents, integer floor division."""
    return """WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 2500000 AS bin
  FROM orders)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       bin * 2500000 AS lo_cents
FROM c GROUP BY bin ORDER BY bin"""


def q_corr_by_group() -> str:
    """Per-l_returnflag Pearson r of (quantity, discount)
    (queries.q_corr_by_group): explicit moment formula with the SAME
    double cast order as the engine, rounded to 6."""
    return """WITH m AS (
  SELECT l_returnflag AS grp,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
                  * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
                  * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sx2,
         CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)
                  * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) AS sy2
  FROM lineitem GROUP BY 1)
SELECT grp, CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6) AS corr
FROM m ORDER BY grp"""


def q_embed_centroids() -> str:
    """Per-label embedding centroids (queries.q_embed_centroids): one row
    per (label, dim); both sides sum exact float32→float64 casts."""
    return """WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, i AS idx,
       round(SUM(v[i + 1]) / COUNT(*), 6) AS mean_val
FROM e, range(0, 64) t(i)
GROUP BY label, i ORDER BY label, i"""


def q_vocab_topk() -> str:
    """Top-100 word bigrams (queries.q_vocab_topk): same single-space
    split convention as the bigram-LM family; (c DESC, bg ASC) boundary."""
    return """WITH t AS (
  SELECT string_split(text, ' ') AS l FROM documents
), bg AS (
  SELECT unnest(list_transform(range(len(l) - 1),
                               i -> l[i + 1] || ' ' || l[i + 2])) AS bg
  FROM t WHERE len(l) >= 2
)
SELECT bg, CAST(COUNT(*) AS BIGINT) AS c
FROM bg GROUP BY 1 ORDER BY c DESC, bg LIMIT 100"""


def q_chunk_dedup() -> str:
    """Duplicated-chunk removal (stages/chunkdedup.py): 16-word aligned
    chunks; a chunk in >= 2 distinct docs keeps only its global first
    (doc_id, position) occurrence; docs rebuilt from surviving chunks."""
    from .stages.chunkdedup import CHUNK_WORDS as W

    return f"""WITH cd_w AS (
  SELECT doc_id, string_split(text, ' ') AS s FROM documents
),
cd_tok AS (
  SELECT doc_id, unnest(s) AS wd,
         CAST(unnest(range(len(s))) AS BIGINT) AS i
  FROM cd_w
),
cd_ch AS (
  SELECT doc_id, i // {W} AS c, string_agg(wd, ' ' ORDER BY i) AS chunk
  FROM cd_tok GROUP BY doc_id, i // {W}
),
cd_occ AS (
  SELECT doc_id, c, chunk,
         ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, c) AS rn,
         COUNT(DISTINCT doc_id) OVER (PARTITION BY chunk) AS nd
  FROM cd_ch
),
cd_kept AS (
  SELECT doc_id, c, chunk FROM cd_occ WHERE nd = 1 OR rn = 1
),
cd_base AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks FROM cd_ch GROUP BY 1
)
SELECT b.doc_id, b.n_chunks,
       CAST(COALESCE(k.kc, 0) AS BIGINT) AS kept_chunks,
       COALESCE(k.txt, '') AS text_clean
FROM cd_base b LEFT JOIN (
  SELECT doc_id, COUNT(*) AS kc,
         string_agg(chunk, ' ' ORDER BY c) AS txt
  FROM cd_kept GROUP BY doc_id) k USING (doc_id)
ORDER BY b.doc_id"""


def q_spatial_clusters() -> str:
    """Spatial single-linkage clusters (queries.q_spatial_clusters):
    recursive min-label closure over the q_distance_selfjoin pair
    predicate, singletons included via self-edges."""
    from .pipelines.queries import DIST_JOIN_RADIUS as R

    return f"""WITH RECURSIVE {base_pts_cte()},
sc_p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM pts2 a JOIN pts2 b ON a.doc_id < b.doc_id
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= {R * R!r}
),
sc_e AS (
  SELECT a, b FROM sc_p UNION SELECT b, a FROM sc_p
  UNION SELECT doc_id AS a, doc_id AS b FROM pts2
),
sc_r AS (
  SELECT a AS node, b AS r FROM sc_e
  UNION
  SELECT sc_r.node, e.b FROM sc_r JOIN sc_e e ON sc_r.r = e.a
)
SELECT node, MIN(r) AS label FROM sc_r GROUP BY node ORDER BY node"""


def q_idw_grid() -> str:
    """IDW census (stages/spatial.idw_grid): each point lands in its own
    + 8 neighbor cells, center distance² in exact µ°² BIGINT, integer
    weights, BIGINT sums."""
    from .stages.spatial import (IDW_CELL_U, IDW_OFF_U, IDW_R2_U,
                                 IDW_VAL_MOD, IDW_W_SCALE)

    return f"""WITH {base_pts_cte()},
idw_p AS (
  SELECT doc_id,
         CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS ix,
         CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS iy,
         (doc_id * 2654435761) % {IDW_VAL_MOD} AS val
  FROM pts2
),
idw_c AS (
  SELECT doc_id, ix, iy, val,
         ((ix + {IDW_OFF_U}) // {IDW_CELL_U})
           - {IDW_OFF_U // IDW_CELL_U} + dx.d AS cx,
         ((iy + {IDW_OFF_U}) // {IDW_CELL_U})
           - {IDW_OFF_U // IDW_CELL_U} + dy.d AS cy
  FROM idw_p
  CROSS JOIN (VALUES (-1), (0), (1)) dx(d)
  CROSS JOIN (VALUES (-1), (0), (1)) dy(d)
),
idw_d AS (
  SELECT cx, cy, val,
         (ix - (cx * {IDW_CELL_U} + {IDW_CELL_U // 2}))
           * (ix - (cx * {IDW_CELL_U} + {IDW_CELL_U // 2}))
         + (iy - (cy * {IDW_CELL_U} + {IDW_CELL_U // 2}))
           * (iy - (cy * {IDW_CELL_U} + {IDW_CELL_U // 2})) AS d2
  FROM idw_c
)
SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       CAST(COUNT(*) AS BIGINT) AS n_pts,
       CAST(SUM({IDW_W_SCALE} // greatest(d2, 1)) AS BIGINT) AS sw,
       CAST(SUM(({IDW_W_SCALE} // greatest(d2, 1)) * val) AS BIGINT) AS swv
FROM idw_d WHERE d2 <= {IDW_R2_U}
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_dbscan() -> str:
    """Full DBSCAN (queries.q_dbscan): the q_distance_selfjoin pair
    predicate, degree census, core flags (deg + 1 >= minPts), recursive
    min-label closure over core-core edges, border = min core-neighbor
    label, noise = -1."""
    from .pipelines.queries import DBSCAN_MINPTS as MP
    from .pipelines.queries import DIST_JOIN_RADIUS as R

    return f"""WITH RECURSIVE {base_pts_cte()},
db_p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM pts2 a JOIN pts2 b ON a.doc_id < b.doc_id
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= {R * R!r}
),
db_e AS (SELECT a, b FROM db_p UNION SELECT b, a FROM db_p),
db_deg AS (SELECT a AS node, COUNT(*) AS n FROM db_e GROUP BY 1),
db_core AS (
  SELECT p.doc_id AS node FROM pts2 p
  LEFT JOIN db_deg d ON d.node = p.doc_id
  WHERE COALESCE(d.n, 0) + 1 >= {MP}
),
db_ce AS (
  SELECT e.a, e.b FROM db_e e
  JOIN db_core c1 ON c1.node = e.a JOIN db_core c2 ON c2.node = e.b
  UNION SELECT node, node FROM db_core
),
db_r AS (
  SELECT a AS node, b AS r FROM db_ce
  UNION
  SELECT db_r.node, e.b FROM db_r JOIN db_ce e ON db_r.r = e.a
),
db_lab AS (SELECT node, MIN(r) AS label FROM db_r GROUP BY node),
db_bord AS (
  SELECT e.a AS node, MIN(l.label) AS label
  FROM db_e e
  JOIN db_core c ON c.node = e.b
  JOIN db_lab l ON l.node = e.b
  WHERE e.a NOT IN (SELECT node FROM db_core)
  GROUP BY 1
)
SELECT p.doc_id,
       CASE WHEN cl.label IS NOT NULL THEN 'core'
            WHEN bl.label IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(COALESCE(cl.label, bl.label, -1) AS BIGINT) AS label
FROM pts2 p
LEFT JOIN db_lab cl ON cl.node = p.doc_id
LEFT JOIN db_bord bl ON bl.node = p.doc_id
ORDER BY p.doc_id"""


def q_image_dims() -> str:
    """Image container dims (stages/imagemeta.py): the engine parses real
    PNG/JPEG headers; the oracle replays datagen.dims_of / fmt closed-form."""
    return f"""SELECT doc_id,
       CASE WHEN doc_id % {dg.FMT_JPEG_MOD} = 0 THEN 'jpeg' ELSE 'png' END
         AS fmt_parsed,
       CAST(12 + ({H(7)} % 9) AS BIGINT) AS width,
       CAST(12 + ({H(8)} % 9) AS BIGINT) AS height
FROM documents ORDER BY doc_id"""


def q_dedup_corpus() -> str:
    """Near-dup removal (queries.q_dedup_corpus): documents minus every
    clustered doc that is not its cluster's min-id representative."""
    labels = q_dup_clusters()
    return f"""SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM ({labels}) lab
  WHERE lab.node = d.doc_id AND lab.label < lab.node)
ORDER BY d.doc_id"""


def q_funnel() -> str:
    """Ordered funnel (stages/analytics.funnel): chained min-after joins —
    greedy earliest-reach equals "an increasing step subsequence exists"."""
    from .stages.analytics import FUNNEL_STEPS

    s1, s2, s3 = FUNNEL_STEPS
    return f"""WITH f1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = '{s1}' GROUP BY user_id
),
f2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN f1 ON f1.user_id = e.user_id
  WHERE e.event_type = '{s2}' AND e.ts > f1.t GROUP BY e.user_id
),
f3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN f2 ON f2.user_id = e.user_id
  WHERE e.event_type = '{s3}' AND e.ts > f2.t GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step_idx, '{s1}' AS step,
         CAST(COUNT(*) AS BIGINT) AS users FROM f1
  UNION ALL
  SELECT CAST(2 AS BIGINT), '{s2}', CAST(COUNT(*) AS BIGINT) FROM f2
  UNION ALL
  SELECT CAST(3 AS BIGINT), '{s3}', CAST(COUNT(*) AS BIGINT) FROM f3
) ORDER BY step_idx"""


def q_cohort_retention() -> str:
    """Weekly cohort retention (stages/analytics.cohort_retention):
    epoch-week integers on both sides, distinct-(user, week) activity."""
    from .stages.analytics import WEEK_US

    return f"""WITH act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS wk FROM events
),
coh AS (
  SELECT user_id, MIN(wk) AS cw FROM act GROUP BY user_id
)
SELECT c.cw AS cohort_week, a.wk - c.cw AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS users
FROM act a JOIN coh c ON c.user_id = a.user_id
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_lift_cooccur() -> str:
    """Item co-occurrence lift (stages/analytics.lift_cooccur): exact
    integer ppm floor-division on both sides, distinct-user universe."""
    return """WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 100 AS item
  FROM events WHERE event_type = 'click'
),
nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM ui),
ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM ui GROUP BY item),
pr AS (
  SELECT a.item AS i, b.item AS j, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM ui a JOIN ui b ON b.user_id = a.user_id AND b.item > a.item
  GROUP BY 1, 2
)
SELECT pr.i, pr.j, pr.c_ab,
       (1000000 * pr.c_ab * nu.n) // (ia.c * ib.c) AS lift_ppm
FROM pr CROSS JOIN nu
JOIN ic ia ON ia.item = pr.i
JOIN ic ib ON ib.item = pr.j
WHERE pr.c_ab >= 2 ORDER BY pr.i, pr.j"""


def q_profile() -> str:
    """Column profiler (stages/analytics.profile): per-column row/null/
    exact-distinct counts + min/max rendered as VARCHAR (numeric min/max
    computed natively before the cast, exactly as the engine does)."""
    parts = []
    for c in ("lang", "source", "n_chars"):
        parts.append(f"""SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_val,
       CAST(MAX({c}) AS VARCHAR) AS max_val
FROM documents""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col"


def q_pct_rank() -> str:
    """Huge-partition PERCENT_RANK as integer ppm
    (stages/analytics.pct_rank): below-count / (n-1) floor division on
    both sides — no float window function in the gate."""
    return """WITH pr_cnt AS (
  SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
pr_cum AS (
  SELECT lang, n_chars,
         COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY n_chars
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below,
         SUM(c) OVER (PARTITION BY lang) AS n
  FROM pr_cnt
)
SELECT d.doc_id, d.lang, d.n_chars,
       CAST(CASE WHEN cu.n > 1 THEN (1000000 * cu.below) // (cu.n - 1)
                 ELSE 0 END AS BIGINT) AS pr_ppm
FROM documents d
JOIN pr_cum cu ON cu.lang = d.lang AND cu.n_chars = d.n_chars
ORDER BY d.doc_id"""


def q_key_spectrum() -> str:
    """Count-of-counts spectrum (stages/analytics.key_spectrum)."""
    return """WITH ks_f AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS freq
  FROM lineitem GROUP BY 1
)
SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_keys
FROM ks_f GROUP BY 1 ORDER BY 1"""


def q_triangles() -> str:
    """Per-node triangle counts (stages/analytics.triangles): i<j<k triple
    self-join over the lift-survivor edge set; every triangle credits all
    three corners."""
    edges = q_lift_cooccur()
    return f"""WITH tr_ed AS (
  SELECT i, j FROM ({edges})
),
tr AS (
  SELECT e1.i AS a, e1.j AS b, e2.j AS c
  FROM tr_ed e1
  JOIN tr_ed e2 ON e2.i = e1.j
  JOIN tr_ed e3 ON e3.i = e1.i AND e3.j = e2.j
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
  SELECT a AS node FROM tr
  UNION ALL SELECT b FROM tr
  UNION ALL SELECT c FROM tr
) GROUP BY node ORDER BY node"""


def q_feature_hash() -> str:
    """Hashing-trick vectorizer (stages/text.feature_hash_batch): identical
    single-space split (empties kept) and md5-upper-half-little-endian
    feature ids on both sides."""
    from .stages.text import FEATURE_HASH_DIM

    return f"""WITH fh_t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT doc_id, CAST(md5_number_lower(tok) % {FEATURE_HASH_DIM} AS BIGINT) AS feat,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM fh_t GROUP BY 1, 2 ORDER BY 1, 2"""


def q_winsorize() -> str:
    """Winsorized per-group sum (stages/analytics.winsorize_sum): DuckDB
    quantile_disc thresholds (rank = ceil(q·n) − 1, the same convention the
    engine's count-table cumsum realizes), integer cents clip + sum."""
    return """WITH wz AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
wth AS (
  SELECT event_type, quantile_disc(cents, 0.05) AS lo,
         quantile_disc(cents, 0.95) AS hi
  FROM wz GROUP BY 1
)
SELECT w.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN w.cents < t.lo THEN t.lo
                WHEN w.cents > t.hi THEN t.hi ELSE w.cents END) AS BIGINT) AS wsum_cents
FROM wz w JOIN wth t ON t.event_type = w.event_type
GROUP BY 1 ORDER BY 1"""


def q_transitions() -> str:
    """First-order transition counts (stages/sessions.transitions): the
    lead() window over (user, ts, event_id) is the per-user consecutive
    pair the engine forms after its shard-local lexsort."""
    return """WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS from_type, nxt AS to_type,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"""


def q_interval_cover() -> str:
    """Interval union per user (stages/sessions.interval_cover): the
    classic exclusive-running-max window; contribution arithmetic is the
    same clip the engine's vectorized sweep computes, all int64 µs."""
    return """WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + (event_id % 7 + 1) * 300000000 AS e
  FROM events
),
w AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM iv
)
SELECT user_id,
       CAST(SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END) AS BIGINT) AS n_islands,
       CAST(SUM(GREATEST(0, e - GREATEST(s, COALESCE(pmax, s)))) AS BIGINT) AS covered_us
FROM w GROUP BY 1 ORDER BY 1"""


def q_skyline() -> str:
    """2-D Pareto frontier (stages/analytics.skyline), window form: a row
    survives iff no strictly-greater-qty row has price ≥ it (exclusive
    value-range max) and no equal-qty row has price strictly above it —
    exactly NOT-EXISTS dominance, duplicates kept on both sides."""
    return """WITH t AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem
),
w AS (
  SELECT l_returnflag, qty_c, price_c,
         max(price_c) OVER (PARTITION BY l_returnflag ORDER BY qty_c
                            RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS m1,
         max(price_c) OVER (PARTITION BY l_returnflag, qty_c) AS m2
  FROM t
)
SELECT l_returnflag, qty_c, price_c FROM w
WHERE (m1 IS NULL OR price_c > m1) AND price_c = m2
ORDER BY 1, 2, 3"""


def q_cell_smooth(res: int = 12) -> str:
    """k-ring smoothing (geo/cells.ring_smooth): per-cell counts cross-join
    the 9 offsets — same tile math as q_cell_counts, no clipping on the
    shifted coordinates on either side."""
    n = 1 << res
    return f"""WITH {base_pts_cte()},
pc AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * {n}.0) AS BIGINT) AS cx,
         CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * {n}.0) AS BIGINT) AS cy,
         COUNT(*) AS n
  FROM pts2 GROUP BY 1, 2
),
off AS (SELECT a.dx, b.dy
        FROM (VALUES (-1), (0), (1)) a(dx)
        CROSS JOIN (VALUES (-1), (0), (1)) b(dy))
SELECT pc.cx + off.dx AS cell_x, pc.cy + off.dy AS cell_y,
       CAST(SUM(pc.n) AS BIGINT) AS n_ring
FROM pc CROSS JOIN off GROUP BY 1, 2 ORDER BY 1, 2"""


def q_scd2() -> str:
    """SCD2 rows (stages/sessions.scd2): lag collapses consecutive equal
    states; lead over the CHANGE rows — ordered by (ts, event_id), the
    engine's lexsort — supplies valid_to; open rows get int64 max."""
    return """WITH s AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
c AS (
  SELECT user_id, event_type, ts_us, event_id FROM s
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS state, ts_us AS valid_from,
       COALESCE(lead(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id),
                9223372036854775807) AS valid_to
FROM c ORDER BY 1, 3"""


def q_weighted_median() -> str:
    """Lower weighted median (stages/analytics.weighted_median): the
    2·cum ≥ tot rank test over the per-(flag, price) weight cumsum — the
    same integer expression the engine's count-table finish evaluates."""
    return """WITH t AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_quantity) AS BIGINT) AS w
  FROM lineitem
),
g AS (SELECT l_returnflag, price_c, SUM(w) AS w FROM t GROUP BY 1, 2),
c AS (
  SELECT l_returnflag, price_c,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_c) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM g
)
SELECT l_returnflag, MIN(price_c) AS wmedian_c
FROM c WHERE 2 * cum >= tot GROUP BY 1 ORDER BY 1"""


def q_embed_gram() -> str:
    """Gram matrix (queries.q_embed_gram): unnest + subscript self-join on
    (vec_id, i ≤ j); CAST to DOUBLE makes per-product values identical to
    the engine's float64 matmul, and round(·, 6) absorbs summation-order
    drift (q_embed_centroids discipline)."""
    return """WITH v AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS val,
         generate_subscripts(embedding, 1) - 1 AS i
  FROM embeddings
)
SELECT a.i AS i, b.i AS j, round(SUM(a.val * b.val), 6) AS g
FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_tile_pyramid(z_hi: int = 12, z_lo: int = 8) -> str:
    """Tile pyramid (geo/cells.tile_pyramid): base z12 cells from the same
    slippy math as q_cell_counts; each coarser zoom is an integer
    right-shift (floor-div by 2^k — tile coords are non-negative, so
    // matches >>)."""
    n = 1 << z_hi
    levels = ", ".join(f"({z})" for z in range(z_lo, z_hi + 1))
    return f"""WITH {base_pts_cte()},
base AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * {n}.0) AS BIGINT) AS bx,
         CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * {n}.0) AS BIGINT) AS by
  FROM pts2
)
SELECT CAST(lv.z AS BIGINT) AS z, bx // (1 << ({z_hi} - lv.z)) AS x,
       by // (1 << ({z_hi} - lv.z)) AS y,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM base CROSS JOIN (VALUES {levels}) lv(z)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


# --- track-geometry kernels (stages/tracks.py) ------------------------------

_TRACK_XY = """xy AS (
  SELECT insee, sidx, doc_id,
         CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS ix,
         CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS iy
  FROM pts2
)"""

_TRACK_TRI = """tri AS (
  SELECT insee, sidx, doc_id, ix, iy,
         LAG(ix) OVER w AS px, LAG(iy) OVER w AS py,
         LEAD(ix) OVER w AS nx, LEAD(iy) OVER w AS ny
  FROM xy WINDOW w AS (PARTITION BY insee, sidx ORDER BY doc_id)
)"""


def q_track_length() -> str:
    """Track polyline length (stages/tracks.track_length): micro-degree
    quantization (floor(lon*1e6+0.5) — identical double on both sides),
    per-segment BIGINT length floor(sqrt(dx²+dy²)+0.5) (sqrt of an
    integer-valued double can never be exactly *.5), exact integer SUM."""
    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
seg AS (
  SELECT insee, sidx, ix, iy,
         LAG(ix) OVER w AS px, LAG(iy) OVER w AS py
  FROM xy WINDOW w AS (PARTITION BY insee, sidx ORDER BY doc_id)
)
SELECT insee, sidx, CAST(COUNT(*) AS BIGINT) AS n_pts,
       CAST(COALESCE(SUM(CASE WHEN px IS NULL THEN 0
         ELSE CAST(floor(sqrt(CAST((ix - px) * (ix - px)
                                  + (iy - py) * (iy - py) AS DOUBLE))
                         + 0.5) AS BIGINT) END), 0) AS BIGINT) AS len_u
FROM seg GROUP BY 1, 2 ORDER BY 1, 2"""


def q_track_simplify() -> str:
    """One-pass Visvalingam thinning (stages/tracks.track_simplify):
    endpoints always kept; interior vertices kept iff the int64
    neighbor-triangle |2·area| >= SIMPLIFY_AREA2 (coords within one zone
    box, products <= ~6.2e12 — exact BIGINT on both sides)."""
    from .stages.tracks import SIMPLIFY_AREA2

    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
{_TRACK_TRI}
SELECT insee, sidx, doc_id,
       CASE WHEN px IS NULL OR nx IS NULL THEN NULL
            ELSE abs((ix - px) * (ny - py) - (nx - px) * (iy - py))
       END AS area2
FROM tri
WHERE px IS NULL OR nx IS NULL
   OR abs((ix - px) * (ny - py) - (nx - px) * (iy - py)) >= {SIMPLIFY_AREA2}
ORDER BY insee, sidx, doc_id"""


def q_bearing_sectors() -> str:
    """8-sector heading histogram (stages/tracks.bearing_sectors): sector
    by pure integer sign/magnitude comparisons (0=ENE counter-clockwise
    to 7=ESE); zero-length quantized segments skipped on both sides."""
    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
seg AS (
  SELECT insee,
         ix - LAG(ix) OVER w AS dx,
         iy - LAG(iy) OVER w AS dy
  FROM xy WINDOW w AS (PARTITION BY insee, sidx ORDER BY doc_id)
)
SELECT insee,
       CAST(CASE WHEN dy >= 0 THEN
              CASE WHEN dx >= 0 THEN (CASE WHEN dx >= dy THEN 0 ELSE 1 END)
                   ELSE (CASE WHEN -dx < dy THEN 2 ELSE 3 END) END
            ELSE
              CASE WHEN dx < 0 THEN (CASE WHEN -dx >= -dy THEN 4 ELSE 5 END)
                   ELSE (CASE WHEN dx < -dy THEN 6 ELSE 7 END) END
       END AS BIGINT) AS sector,
       CAST(COUNT(*) AS BIGINT) AS n_segs
FROM seg
WHERE dx IS NOT NULL AND NOT (dx = 0 AND dy = 0)
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_stay_points() -> str:
    """Stay-point detection (stages/tracks.stay_points): maximal runs of
    consecutive track points with step distance² < STAY_T2, ≥ STAY_MIN_PTS
    points — gaps-and-islands via a cumulative break-count window."""
    from .stages.tracks import STAY_MIN_PTS, STAY_T2

    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
seg AS (
  SELECT insee, sidx, doc_id,
         LAG(doc_id) OVER w AS pdoc,
         (ix - LAG(ix) OVER w) AS dx,
         (iy - LAG(iy) OVER w) AS dy
  FROM xy WINDOW w AS (PARTITION BY insee, sidx ORDER BY doc_id)
),
flag AS (
  SELECT insee, sidx, doc_id, pdoc,
         (dx IS NOT NULL AND dx*dx + dy*dy < {STAY_T2}) AS close_step,
         SUM(CASE WHEN dx IS NULL OR dx*dx + dy*dy >= {STAY_T2}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY insee, sidx ORDER BY doc_id) AS run_id
  FROM seg
)
SELECT insee, sidx, MIN(pdoc) AS start_doc, MAX(doc_id) AS end_doc,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_pts
FROM flag WHERE close_step
GROUP BY insee, sidx, run_id
HAVING COUNT(*) + 1 >= {STAY_MIN_PTS}
ORDER BY insee, sidx, start_doc"""


def q_snap_points() -> str:
    """Point→segment snap (stages/tracks.snap_points): per point, the
    nearest segment of a DIFFERENT street in its zone.  Branch conditions
    are BIGINT comparisons; the interior distance² cross²/len2 evaluates
    in DOUBLE with the numpy kernel's op order, so the (d2, sidx, sdoc)
    argmin is deterministic and identical on both sides."""
    d2 = """CASE WHEN (dx*dx + dy*dy) = 0 OR (dx*dpx + dy*dpy) <= 0
         THEN CAST(dpx*dpx + dpy*dpy AS DOUBLE)
         WHEN (dx*dpx + dy*dpy) >= (dx*dx + dy*dy)
         THEN CAST(dqx*dqx + dqy*dqy AS DOUBLE)
         ELSE (CAST(dx*dpy - dy*dpx AS DOUBLE)
               * CAST(dx*dpy - dy*dpx AS DOUBLE))
              / CAST(dx*dx + dy*dy AS DOUBLE) END"""
    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
seg AS (
  SELECT insee, sidx, doc_id AS sdoc, ix AS bx, iy AS by2,
         LAG(ix) OVER w AS ax, LAG(iy) OVER w AS ay
  FROM xy WINDOW w AS (PARTITION BY insee, sidx ORDER BY doc_id)
),
seg2 AS (SELECT * FROM seg WHERE ax IS NOT NULL),
cand AS (
  SELECT p.doc_id, p.insee, s.sidx AS snap_sidx, s.sdoc AS snap_doc,
         (s.bx - s.ax) AS dx, (s.by2 - s.ay) AS dy,
         (p.ix - s.ax) AS dpx, (p.iy - s.ay) AS dpy,
         (p.ix - s.bx) AS dqx, (p.iy - s.by2) AS dqy
  FROM xy p JOIN seg2 s ON s.insee = p.insee AND s.sidx <> p.sidx
),
dist AS (
  SELECT doc_id, insee, snap_sidx, snap_doc, {d2} AS d2,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY {d2}, snap_sidx, snap_doc) AS rn
  FROM cand
)
SELECT doc_id, insee, snap_sidx, snap_doc,
       CAST(floor(d2 + 0.5) AS BIGINT) AS d2_u
FROM dist WHERE rn = 1 ORDER BY doc_id"""


def q_track_turns() -> str:
    """Signed-cross turn census (stages/tracks.track_turns): per-track
    counts of left / right / exactly-collinear interior vertices; tracks
    without interior vertices report zeros (the GROUP BY runs over every
    vertex, so 1-2 point tracks still emit a row)."""
    cross = "((ix - px) * (ny - py) - (nx - px) * (iy - py))"
    inter = "px IS NOT NULL AND nx IS NOT NULL"
    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
{_TRACK_TRI}
SELECT insee, sidx,
       CAST(SUM(CASE WHEN {inter} AND {cross} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_left,
       CAST(SUM(CASE WHEN {inter} AND {cross} < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_right,
       CAST(SUM(CASE WHEN {inter} AND {cross} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_straight
FROM tri GROUP BY 1, 2 ORDER BY 1, 2"""


def q_track_length_m() -> str:
    """Geodesic track length (stages/tracks.track_length_m): haversine with
    R=6371 km, per-segment BIGINT millimetres (identical operation order —
    numpy and DuckDB libm probed bit-equal over the full corpus), exact
    integer SUM so distribution order cannot perturb totals."""
    hav = ("""CAST(floor(2.0 * 6371000.0 * asin(sqrt(
        sin(radians(lat - plat) / 2.0) * sin(radians(lat - plat) / 2.0)
      + cos(radians(plat)) * cos(radians(lat))
        * sin(radians(lon - plon) / 2.0) * sin(radians(lon - plon) / 2.0)
      )) * 1000.0 + 0.5) AS BIGINT)""")
    return f"""WITH {base_pts_cte()},
seg AS (
  SELECT insee, sidx, lat, lon,
         LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon
  FROM pts2 WINDOW w AS (PARTITION BY insee, sidx ORDER BY doc_id)
)
SELECT insee, sidx,
       CAST(COALESCE(SUM(CASE WHEN plat IS NULL THEN 0 ELSE {hav} END), 0)
            AS BIGINT) AS len_mm
FROM seg GROUP BY 1, 2 ORDER BY 1, 2"""


def q_wds_export(docs_per_shard: int = 64) -> str:
    """WebDataset shard index (pipelines/sinks.write_wds_shards): shard
    assignment is doc_id // docs_per_shard; names zero-pad to 6 digits."""
    return f"""SELECT doc_id // {docs_per_shard} AS shard_id,
       'shard-' || lpad(CAST(doc_id // {docs_per_shard} AS VARCHAR), 6, '0')
                || '.tar' AS shard_name,
       CAST(COUNT(*) AS BIGINT) AS n_samples
FROM documents GROUP BY 1, 2 ORDER BY 1"""


def q_cell_mode(res: int = 12) -> str:
    """Grouped mode (stages/analytics.grouped_mode): per-cell argmax by
    count, ties to the lexicographically smallest source."""
    n = 1 << res
    return f"""WITH {base_pts_cte()},
cells AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * {n}.0) AS BIGINT) AS cell_x,
         CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * {n}.0) AS BIGINT) AS cell_y,
         source
  FROM pts2
),
cc AS (
  SELECT cell_x, cell_y, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2, 3
)
SELECT cell_x, cell_y, source AS mode_source, n
FROM (SELECT *, row_number() OVER (PARTITION BY cell_x, cell_y
                                   ORDER BY n DESC, source) AS rn FROM cc)
WHERE rn = 1 ORDER BY 1, 2"""


def q_decay_score() -> str:
    """Recency-decayed engagement score (queries.q_decay_score): the decay
    is an integer right-shift per elapsed half-life, so SUM order cannot
    perturb the total; cents expression matches the established
    round(value*100) parity pin."""
    from .pipelines.queries import DECAY_ANCHOR_US, DECAY_HALF_LIFE_DAYS

    return f"""SELECT user_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)
                // (1 << (CAST(({DECAY_ANCHOR_US} - epoch_us(ts)) AS BIGINT)
                          // 86400000000 // {DECAY_HALF_LIFE_DAYS})))
            AS BIGINT) AS score_c
FROM events GROUP BY 1 ORDER BY 1"""


def q_window_selfjoin(gap_us: int = 30 * 60 * 1000000) -> str:
    """Stream-stream interval self-join (sessions.window_selfjoin): LEFT
    events strictly before the right instant, within gap_us; µs-integer
    comparisons on both sides."""
    return f"""SELECT b.event_id, b.user_id,
       CAST(COUNT(a.event_id) AS BIGINT) AS n_prior
FROM events b LEFT JOIN events a
  ON a.user_id = b.user_id AND a.event_type = 'view'
 AND epoch_us(a.ts) >= epoch_us(b.ts) - {gap_us}
 AND epoch_us(a.ts) < epoch_us(b.ts)
WHERE b.event_type = 'purchase'
GROUP BY 1, 2 ORDER BY 1"""


def q_cusum_days() -> str:
    """Daily-volume CUSUM drift (queries.q_cusum_days): deviation in
    cross-multiplied integers, no float mean."""
    return """WITH dc AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS d_cnt, CAST(SUM(n) AS BIGINT) AS total
  FROM dc
)
SELECT day, n,
       CAST(SUM(n) OVER (ORDER BY day) * d_cnt
            - (row_number() OVER (ORDER BY day)) * total AS BIGINT) AS dev
FROM dc, tot ORDER BY day"""


def q_missing_slots() -> str:
    """Coverage gaps (queries.q_missing_slots): 10-minute calendar
    anti-join between the stream's first and last observed slot."""
    return """WITH h AS (
  SELECT DISTINCT epoch_us(ts) // 600000000 AS slot FROM events
), g AS (
  SELECT slot, LEAD(slot) OVER (ORDER BY slot) AS nxt FROM h
)
SELECT UNNEST(generate_series(slot + 1, nxt - 1)) AS slot
FROM g WHERE nxt > slot + 1 ORDER BY 1"""


def q_zone_digest_diff() -> str:
    """Per-zone snapshot digest diff (stages/digest.zone_digest_diff):
    fingerprint of the first FP_LEN codepoints (prepending '~' shifts the
    multipliers by one), per-doc term (fp*A + doc_id*B + 1) mod P summed
    per zone in HUGEINT — bit-for-bit the engine's split-half bincount."""
    from .stages.digest import (DIFF_MOD, DIFF_RESIDUE, P, TERM_A, TERM_B)
    from .stages.text import FP_LEN, FP_MOD, FP_MULTS

    mults = "[" + ", ".join(str(m) for m in FP_MULTS) + "]"

    def fp_expr(txt: str) -> str:
        return (f"CAST(COALESCE(list_sum(list_transform("
                f"range(least(length({txt}), {FP_LEN})), "
                f"i -> CAST(unicode(substr({txt}, i + 1, 1)) AS BIGINT)"
                f" * list_extract({mults}, i + 1))), 0) % {FP_MOD}"
                f" AS BIGINT)")

    def term(fp: str) -> str:
        return (f"(CAST({fp} AS HUGEINT) * {TERM_A}"
                f" + CAST(doc_id AS HUGEINT) * {TERM_B} + 1) % {P}")

    return f"""WITH {base_pts_cte()},
fp AS (
  SELECT p.insee, d.doc_id,
         {fp_expr("d.text")} AS fp_a,
         {fp_expr("'~' || d.text")} AS fp_m
  FROM pts2 p JOIN documents d USING (doc_id)
),
t AS (
  SELECT insee, doc_id, fp_a,
         CASE WHEN doc_id % {DIFF_MOD} = {DIFF_RESIDUE} THEN fp_m
              ELSE fp_a END AS fp_b
  FROM fp
),
z AS (
  SELECT insee,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(CASE WHEN doc_id % {DIFF_MOD} = {DIFF_RESIDUE}
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_changed,
         CAST(SUM({term("fp_a")}) % {P} AS BIGINT) AS digest_a,
         CAST(SUM({term("fp_b")}) % {P} AS BIGINT) AS digest_b
  FROM t GROUP BY insee
)
SELECT insee, n_docs, n_changed, digest_a, digest_b,
       CAST(CASE WHEN digest_a <> digest_b THEN 1 ELSE 0 END AS BIGINT)
         AS differs
FROM z ORDER BY insee"""


def q_seq_pack() -> str:
    """Sequence packing (stages/packing.seq_pack): whitespace token counts
    (_NTOK), exclusive running sum per lang ordered by doc_id, chunk =
    floor(start / CAP)."""
    from .stages.packing import CAP

    return f"""WITH tok AS (
  SELECT doc_id, lang, CAST({_NTOK} AS BIGINT) AS ntok FROM documents
), off AS (
  SELECT doc_id, lang, ntok,
         COALESCE(SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_off
  FROM tok
)
SELECT lang, CAST(start_off // {CAP} AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM off GROUP BY 1, 2 ORDER BY 1, 2"""


def q_vec_quantize() -> str:
    """Int8 scalar quantization (stages/quantize.vec_quantize): global
    per-dim min/max, code = floor((x-mn)*255/(mx-mn)+0.5) — a chain of
    correctly-rounded double ops, bit-equal numpy vs DuckDB; integer
    summaries (sum / sum-of-squares / positional 257^j-weighted hash)."""
    from .stages.quantize import DIM, HASH_W, LEVELS

    w = "[" + ", ".join(str(x) for x in HASH_W) + "]"
    return f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
u AS (
  SELECT vec_id, UNNEST(v) AS x,
         UNNEST(generate_series(1, {DIM})) AS i
  FROM e
),
mm AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM u GROUP BY i),
codes AS (
  SELECT vec_id, i,
         CASE WHEN mx = mn THEN 0
              ELSE CAST(floor((x - mn) * {LEVELS}.0 / (mx - mn) + 0.5)
                        AS BIGINT) END AS c
  FROM u JOIN mm USING (i)
)
SELECT vec_id,
       CAST(SUM(c) AS BIGINT) AS code_sum,
       CAST(SUM(c * c) AS BIGINT) AS code_sq,
       CAST(SUM(c * list_extract({w}, i)) AS BIGINT) AS code_hash
FROM codes GROUP BY vec_id ORDER BY vec_id"""


def q_street_crossings() -> str:
    """Street-crossing census (stages/crossings.street_crossings): strict
    integer orientation straddle between segments of different streets in
    the same zone (coords span ≤ one zone box — cross products ≤ ~6.2e12,
    exact BIGINT).  The oracle joins per zone without the engine's grid
    cells — different plan, same proper-intersection set."""
    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
seg AS (
  SELECT insee, sidx,
         LAG(ix) OVER w AS ax, LAG(iy) OVER w AS ay,
         ix AS bx, iy AS by
  FROM xy WINDOW w AS (PARTITION BY insee, sidx ORDER BY doc_id)
),
s AS (SELECT * FROM seg WHERE ax IS NOT NULL),
hits AS (
  SELECT s1.insee, s1.sidx AS sidx_a, s2.sidx AS sidx_b,
         (s1.bx - s1.ax) * (s2.ay - s1.ay)
           - (s1.by - s1.ay) * (s2.ax - s1.ax) AS o1,
         (s1.bx - s1.ax) * (s2.by - s1.ay)
           - (s1.by - s1.ay) * (s2.bx - s1.ax) AS o2,
         (s2.bx - s2.ax) * (s1.ay - s2.ay)
           - (s2.by - s2.ay) * (s1.ax - s2.ax) AS o3,
         (s2.bx - s2.ax) * (s1.by - s2.ay)
           - (s2.by - s2.ay) * (s1.bx - s2.ax) AS o4
  FROM s s1 JOIN s s2
    ON s1.insee = s2.insee AND s1.sidx < s2.sidx
)
SELECT insee, sidx_a, sidx_b, CAST(COUNT(*) AS BIGINT) AS n_crossings
FROM hits
WHERE ((o1 > 0 AND o2 < 0) OR (o1 < 0 AND o2 > 0))
  AND ((o3 > 0 AND o4 < 0) OR (o3 < 0 AND o4 > 0))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


def q_mad_outliers() -> str:
    """MAD outliers (stages/analytics.mad_outliers): lower median twice
    via the 2·cum ≥ tot rank test (the q_weighted_median expression),
    then an exact-integer |c − med| > 3·mad census."""
    return """WITH t AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
),
g AS (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS w
      FROM t GROUP BY 1, 2),
cu AS (
  SELECT event_type, c,
         SUM(w) OVER (PARTITION BY event_type ORDER BY c) AS cum,
         SUM(w) OVER (PARTITION BY event_type) AS tot
  FROM g
),
med AS (SELECT event_type, MIN(c) AS med_c
        FROM cu WHERE 2 * cum >= tot GROUP BY 1),
d AS (
  SELECT t.event_type, t.c, abs(t.c - m.med_c) AS dv, m.med_c
  FROM t JOIN med m USING (event_type)
),
g2 AS (SELECT event_type, dv, CAST(COUNT(*) AS BIGINT) AS w
       FROM d GROUP BY 1, 2),
cu2 AS (
  SELECT event_type, dv,
         SUM(w) OVER (PARTITION BY event_type ORDER BY dv) AS cum,
         SUM(w) OVER (PARTITION BY event_type) AS tot
  FROM g2
),
mad AS (SELECT event_type, MIN(dv) AS mad_c
        FROM cu2 WHERE 2 * cum >= tot GROUP BY 1)
SELECT d.event_type, ANY_VALUE(d.med_c) AS med_c, ANY_VALUE(m.mad_c) AS mad_c,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(CASE WHEN d.dv > 3 * m.mad_c THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_outliers
FROM d JOIN mad m USING (event_type)
GROUP BY 1 ORDER BY 1"""


def q_top_orders() -> str:
    """TPC-H Q3 shape (queries.q_top_orders): revenue cents per line via
    tie-free floor(x+0.5) (the engine's identical double chain — plain
    round() differs on exact .5 ties: half-even vs half-away),
    deterministic top-10 via (rev DESC, orderkey)."""
    from .pipelines.queries import _Q3_DATE_US, _Q3_SEGMENT

    d = _Q3_DATE_US // 1_000_000
    return f"""SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS rev_c
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
  AND o.o_orderdate < to_timestamp({d})
  AND l.l_shipdate > to_timestamp({d})
GROUP BY 1, 2, 3
ORDER BY rev_c DESC, o.o_orderkey LIMIT 10"""


def q_image_patches() -> str:
    """ViT patch statistics (pipelines/flagship.image_patches): the engine
    decodes REAL PNG payloads; the oracle replays datagen.pixels_of_batch
    closed-form — per-channel hash fields (int64 overflow wrap emulated in
    HUGEINT, numpy's sign-of-divisor %) + bilinear gradient + one cosine
    (libm probed bit-equal, BASELINE.md) — and aggregates exact integer
    patch sums.  PNG-only on both sides, so the lossy codec never gates."""
    from .pipelines.flagship import PATCH
    from . import datagen as dgm

    U64 = 18446744073709551616
    S63 = 9223372036854775808

    def s64(e: str) -> str:
        u = f"((({e}) % {U64} + {U64}) % {U64})"
        return f"(CASE WHEN {u} >= {S63} THEN {u} - {U64} ELSE {u} END)"

    def pmod(e: str, m: int) -> str:
        return f"((({e}) % {m} + {m}) % {m})"

    def hof(salt: int) -> str:
        prod = (f"((CAST(doc_id AS HUGEINT) * 3 + ch) * {dgm.PX_STEP}"
                f" + {salt}) * {dgm.MULT}")
        return pmod(s64(prod), dgm.MOD)

    noise_prod = (f"(CAST(doc_id AS HUGEINT) * {dgm.PX_STEP} + k"
                  f" + {dgm.PX_SALT}) * {dgm.MULT}")
    noise = (f"CAST({pmod(pmod(s64(noise_prod), dgm.MOD), 2 * dgm.PX_NOISE + 1)}"
             f" AS DOUBLE) - {dgm.PX_NOISE}.0")

    return f"""WITH img AS (
  SELECT doc_id,
         12 + ({H(7)} % 9) AS w,
         12 + ({H(8)} % 9) AS h
  FROM documents WHERE doc_id % {dgm.FMT_JPEG_MOD} <> 0
),
px AS (
  SELECT doc_id, w, h,
         UNNEST(generate_series(0, w * h * 3 - 1)) AS k
  FROM img
),
f AS (
  SELECT doc_id, w, h, k, (k // 3) AS pix, (k % 3) AS ch FROM px
),
g AS (
  SELECT doc_id, w, pix,
         CAST(pix % w AS DOUBLE) / CAST(GREATEST(w - 1, 1) AS DOUBLE) AS x,
         CAST(pix // w AS DOUBLE) / CAST(GREATEST(h - 1, 1) AS DOUBLE) AS y,
         CAST({hof(11)} % 128 AS DOUBLE) AS b128,
         CAST({hof(12)} % 129 AS DOUBLE) AS gx129,
         CAST({hof(13)} % 129 AS DOUBLE) AS gy129,
         CAST({hof(14)} % 33 AS DOUBLE) AS a33,
         CAST({hof(15)} % 2 AS DOUBLE) AS f2x,
         CAST({hof(16)} % 2 AS DOUBLE) AS f2y,
         {noise} AS nf
  FROM f
),
v AS (
  SELECT doc_id, (pix // w) AS row_y, (pix % w) AS col_x,
         (((((gx129 - 64.0) * x) + (64.0 + b128)) + ((gy129 - 64.0) * y))
           + (cos(((1.0 + f2x) * x + (1.0 + f2y) * y) * (2 * pi()))
              * (16.0 + a33))) + nf AS val
  FROM g
)
SELECT doc_id,
       CAST(row_y // {PATCH} AS BIGINT) AS patch_y,
       CAST(col_x // {PATCH} AS BIGINT) AS patch_x,
       CAST(SUM(CAST(least(greatest(round_even(val, 0), 0.0), 255.0) AS BIGINT))
            AS BIGINT) AS psum,
       CAST(COUNT(*) // 3 AS BIGINT) AS n_px
FROM v GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


def q_cell_image_mosaic() -> str:
    """Geo × image mosaic (queries.q_cell_image_mosaic): the
    q_image_thumbs pixel-replay restricted sums, re-keyed by the
    q_cell_counts z12 tile of each doc's coordinates."""
    thumbs_sql = q_image_thumbs()
    from .stages.parse import CELL_RES

    n = 1 << CELL_RES
    return f"""WITH tm AS (
  SELECT * FROM ({thumbs_sql})
),
{base_pts_cte()},
cells AS (
  SELECT doc_id,
         CAST(floor((lon + 180.0) / 360.0 * {n}.0) AS BIGINT) AS cell_x,
         CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat)))
                     / pi()) / 2.0 * {n}.0) AS BIGINT) AS cell_y
  FROM pts2
)
SELECT c.cell_x, c.cell_y, t.ch,
       CAST(COUNT(*) AS BIGINT) AS n_img,
       CAST(SUM(t.thumb_sum) AS BIGINT) AS thumb_sum
FROM tm t JOIN cells c USING (doc_id)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


def q_quadtree_leaves(z_hi: int = 12, z_lo: int = 8) -> str:
    """Quadtree leaves (geo/cells.quadtree_leaves): pyramid counts (the
    q_tile_pyramid expression) + LEFT JOIN to the parent tile; leaf iff
    (z = z_lo OR parent_n > T) AND (n <= T OR z = z_hi)."""
    from .geo.cells import QT_THRESHOLD as T

    n = 1 << z_hi
    levels = ", ".join(f"({z})" for z in range(z_lo, z_hi + 1))
    return f"""WITH {base_pts_cte()},
base AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * {n}.0) AS BIGINT) AS bx,
         CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * {n}.0) AS BIGINT) AS by
  FROM pts2
),
pyr AS (
  SELECT lv.z AS z, bx // (1 << ({z_hi} - lv.z)) AS x,
         by // (1 << ({z_hi} - lv.z)) AS y,
         CAST(COUNT(*) AS BIGINT) AS n_points
  FROM base CROSS JOIN (VALUES {levels}) lv(z)
  GROUP BY 1, 2, 3
)
SELECT CAST(c.z AS BIGINT) AS z, c.x, c.y, c.n_points
FROM pyr c LEFT JOIN pyr p
  ON p.z = c.z - 1 AND p.x = c.x // 2 AND p.y = c.y // 2
WHERE (c.z = {z_lo} OR p.n_points > {T})
  AND (c.n_points <= {T} OR c.z = {z_hi})
ORDER BY 1, 2, 3"""


def q_zone_manifest() -> str:
    """Partition manifest (queries.q_zone_manifest): plain per-zone stats
    over the synthesized columns; micro-degree bbox via the shared
    floor(coord*1e6+0.5) quantization."""
    return f"""WITH {base_pts_cte()}
SELECT insee,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
       CAST(MIN(CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS min_ix,
       CAST(MAX(CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS max_ix,
       CAST(MIN(CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS min_iy,
       CAST(MAX(CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS max_iy,
       CAST(COUNT(DISTINCT sidx) AS BIGINT) AS n_streets
FROM pts2 GROUP BY insee ORDER BY insee"""


def q_nearest_hub() -> str:
    """Nearest-facility assignment (queries.q_nearest_hub): hub centers
    are closed-form integer micro-degree literals (the engine's exact
    floor expressions evaluated here), distance² in exact BIGINT,
    (d2, hub_zone) row_number tiebreak."""
    import numpy as np

    from . import datagen as dgm
    from .pipelines.queries import HUB_MOD

    zones = np.arange(dgm.NZONES, dtype=np.int64)
    hubs = zones[zones % HUB_MOD == 0]
    zx, zy = hubs // dgm.NZY, hubs % dgm.NZY
    cx = np.floor((dgm.LON0 + (zx + 0.5) * dgm.LON_SPAN
                   / dgm.NZX) * 1e6 + 0.5).astype(np.int64)
    cy = np.floor((dgm.LAT0 + (zy + 0.5) * dgm.LAT_SPAN
                   / dgm.NZY) * 1e6 + 0.5).astype(np.int64)
    rows = ", ".join(f"({int(z)}, {int(x)}, {int(y)})"
                     for z, x, y in zip(hubs, cx, cy))
    return f"""WITH {base_pts_cte()},
xy AS (
  SELECT doc_id,
         CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS ix,
         CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS iy
  FROM pts2
),
hubs(hub_zone, cx, cy) AS (VALUES {rows}),
d AS (
  SELECT doc_id, hub_zone,
         (ix - cx) * (ix - cx) + (iy - cy) * (iy - cy) AS d2
  FROM xy CROSS JOIN hubs
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY d2, hub_zone) AS rn
  FROM d
)
SELECT CAST(hub_zone AS BIGINT) AS hub_zone,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(d2) AS BIGINT) AS sum_d2
FROM r WHERE rn = 1 GROUP BY hub_zone ORDER BY 1"""


def q_late_events() -> str:
    """Watermark lateness (stages/packing.late_events): running MAX over
    (proc_ts, event_id) order, strict prior rows only, 5-min allowance."""
    from .stages.packing import LATE_ALLOWED_US, LATE_DELAY_MOD

    return f"""WITH t AS (
  SELECT event_id, event_type, epoch_us(ts) AS ets,
         epoch_us(ts) + ((event_id * 2654435761) % 2147483647)
           % {LATE_DELAY_MOD} AS pts
  FROM events
),
w AS (
  SELECT event_type, ets,
         MAX(ets) OVER (ORDER BY pts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS wm
  FROM t
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(CASE WHEN wm IS NOT NULL
                               AND ets < wm - {LATE_ALLOWED_US}
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late
FROM w GROUP BY 1 ORDER BY 1"""


def q_dup_cluster_sizes() -> str:
    """Duplicate-cluster size spectrum (queries.q_dup_cluster_sizes):
    count-of-counts over the recursive-closure labels."""
    inner = q_dup_clusters()
    return f"""WITH labs AS ({inner})
SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM (SELECT label, CAST(COUNT(*) AS BIGINT) AS sz FROM labs GROUP BY 1) t
GROUP BY 1 ORDER BY 1"""


def q_ann_recall() -> str:
    """ANN recall@k (queries.q_ann_recall): intersection of the two
    existing closed-form top-k SQLs, exact integer ppm."""
    from .pipelines.queries import ANN_K

    return f"""WITH brute AS ({q_ann_topk()}),
lsh AS ({q_ann_lsh()}),
hits AS (
  SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM brute b JOIN lsh l
    ON b.query_id = l.query_id AND b.vec_id = l.vec_id
  GROUP BY 1
)
SELECT q.query_id, COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) * 1000000 // {ANN_K} AS BIGINT)
         AS recall_ppm
FROM (SELECT DISTINCT query_id FROM brute) q
LEFT JOIN hits h USING (query_id) ORDER BY 1"""


def q_scene_cuts() -> str:
    """Video scene cuts (pipelines/flagship.SceneCuts): per-frame exact
    luminance sums of the closed-form pixel field (frame id = video·FPV+i,
    fixed 10×8 dims), LAG diffs, jumps > SCENE_CUT_T counted per video."""
    from .pipelines.flagship import (FRAME_H, FRAME_W, FRAMES_PER_VIDEO,
                                     SCENE_CUT_T)
    from . import datagen as dgm

    U64 = 18446744073709551616
    S63 = 9223372036854775808
    nval = FRAME_W * FRAME_H * 3

    def s64(e: str) -> str:
        u = f"((({e}) % {U64} + {U64}) % {U64})"
        return f"(CASE WHEN {u} >= {S63} THEN {u} - {U64} ELSE {u} END)"

    def pmod(e: str, m: int) -> str:
        return f"((({e}) % {m} + {m}) % {m})"

    def hof(salt: int) -> str:
        prod = (f"((CAST(fid AS HUGEINT) * 3 + ch) * {dgm.PX_STEP}"
                f" + {salt}) * {dgm.MULT}")
        return pmod(s64(prod), dgm.MOD)

    noise_prod = (f"(CAST(fid AS HUGEINT) * {dgm.PX_STEP} + k"
                  f" + {dgm.PX_SALT}) * {dgm.MULT}")
    noise = (f"CAST({pmod(pmod(s64(noise_prod), dgm.MOD), 2 * dgm.PX_NOISE + 1)}"
             f" AS DOUBLE) - {dgm.PX_NOISE}.0")

    return f"""WITH fr AS (
  SELECT doc_id AS video_id,
         UNNEST(generate_series(0, {FRAMES_PER_VIDEO - 1})) AS fi
  FROM documents
),
f2 AS (
  SELECT video_id, fi, video_id * {FRAMES_PER_VIDEO} + fi AS fid FROM fr
),
px AS (
  SELECT video_id, fi, fid,
         UNNEST(generate_series(0, {nval - 1})) AS k
  FROM f2
),
f AS (
  SELECT video_id, fi, fid, k,
         (k // 3) AS pix, (k % 3) AS ch
  FROM px
),
g AS (
  SELECT video_id, fi, fid, k, pix, ch,
         CAST(pix % {FRAME_W} AS DOUBLE) / {FRAME_W - 1}.0 AS x,
         CAST(pix // {FRAME_W} AS DOUBLE) / {FRAME_H - 1}.0 AS y,
         CAST({hof(11)} % 128 AS DOUBLE) AS b128,
         CAST({hof(12)} % 129 AS DOUBLE) AS gx129,
         CAST({hof(13)} % 129 AS DOUBLE) AS gy129,
         CAST({hof(14)} % 33 AS DOUBLE) AS a33,
         CAST({hof(15)} % 2 AS DOUBLE) AS f2x,
         CAST({hof(16)} % 2 AS DOUBLE) AS f2y,
         {noise} AS nf
  FROM f
),
lum AS (
  SELECT video_id, fi,
         CAST(SUM(CAST(least(greatest(round_even(
           (((((gx129 - 64.0) * x) + (64.0 + b128)) + ((gy129 - 64.0) * y))
             + (cos(((1.0 + f2x) * x + (1.0 + f2y) * y) * (2 * pi()))
                * (16.0 + a33))) + nf, 0), 0.0), 255.0) AS BIGINT))
           AS BIGINT) AS lum
  FROM g GROUP BY 1, 2
),
d AS (
  SELECT video_id,
         abs(lum - LAG(lum) OVER (PARTITION BY video_id ORDER BY fi))
           AS jump
  FROM lum
)
SELECT video_id,
       CAST(COALESCE(SUM(CASE WHEN jump > {SCENE_CUT_T} THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS n_cuts,
       CAST(COALESCE(MAX(jump), 0) AS BIGINT) AS max_jump
FROM d WHERE jump IS NOT NULL GROUP BY 1 ORDER BY 1"""


def q_frame_diff() -> str:
    """Inter-frame change census (pipelines/flagship.FrameDiff): the
    q_scene_cuts pixel replay (identical CTE structure, so the double
    chain matches bit-for-bit), self-joined at (fi, k) vs (fi−1, k),
    exact threshold count + abs-diff sum."""
    from .pipelines.flagship import (FRAME_DIFF_T, FRAME_H, FRAME_W,
                                     FRAMES_PER_VIDEO)
    from . import datagen as dgm

    nval = FRAME_W * FRAME_H * 3

    def hof(salt: int) -> str:
        prod = (f"((CAST(fid AS HUGEINT) * 3 + ch) * {dgm.PX_STEP}"
                f" + {salt}) * {dgm.MULT}")
        return _pmod(_s64(prod), dgm.MOD)

    noise_prod = (f"(CAST(fid AS HUGEINT) * {dgm.PX_STEP} + k"
                  f" + {dgm.PX_SALT}) * {dgm.MULT}")
    noise = (f"CAST({_pmod(_pmod(_s64(noise_prod), dgm.MOD), 2 * dgm.PX_NOISE + 1)}"
             f" AS DOUBLE) - {dgm.PX_NOISE}.0")

    return f"""WITH fd_fr AS (
  SELECT doc_id AS video_id,
         UNNEST(generate_series(0, {FRAMES_PER_VIDEO - 1})) AS fi
  FROM documents
),
fd_f2 AS (
  SELECT video_id, fi, video_id * {FRAMES_PER_VIDEO} + fi AS fid FROM fd_fr
),
fd_px AS (
  SELECT video_id, fi, fid,
         UNNEST(generate_series(0, {nval - 1})) AS k
  FROM fd_f2
),
fd_f AS (
  SELECT video_id, fi, fid, k,
         (k // 3) AS pix, (k % 3) AS ch
  FROM fd_px
),
fd_g AS (
  SELECT video_id, fi, fid, k, pix, ch,
         CAST(pix % {FRAME_W} AS DOUBLE) / {FRAME_W - 1}.0 AS x,
         CAST(pix // {FRAME_W} AS DOUBLE) / {FRAME_H - 1}.0 AS y,
         CAST({hof(11)} % 128 AS DOUBLE) AS b128,
         CAST({hof(12)} % 129 AS DOUBLE) AS gx129,
         CAST({hof(13)} % 129 AS DOUBLE) AS gy129,
         CAST({hof(14)} % 33 AS DOUBLE) AS a33,
         CAST({hof(15)} % 2 AS DOUBLE) AS f2x,
         CAST({hof(16)} % 2 AS DOUBLE) AS f2y,
         {noise} AS nf
  FROM fd_f
),
fd_v AS (
  SELECT video_id, fi, k,
         CAST(least(greatest(round_even(
           (((((gx129 - 64.0) * x) + (64.0 + b128)) + ((gy129 - 64.0) * y))
             + (cos(((1.0 + f2x) * x + (1.0 + f2y) * y) * (2 * pi()))
                * (16.0 + a33))) + nf, 0), 0.0), 255.0) AS BIGINT) AS val
  FROM fd_g
)
SELECT a.video_id, a.fi AS frame_idx,
       CAST(SUM(CASE WHEN abs(a.val - b.val) > {FRAME_DIFF_T}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(abs(a.val - b.val)) AS BIGINT) AS sum_absdiff
FROM fd_v a
JOIN fd_v b ON b.video_id = a.video_id AND b.fi = a.fi - 1 AND b.k = a.k
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_frame_sample() -> str:
    """Sampled-frame luminance census (pipelines/flagship.FrameSampler,
    step=2): the q_scene_cuts pixel replay restricted to the SAMPLED
    frames (fi % 2 = 0) — exact integer per-frame luminance sums; the
    skipped frames never enter the plan on either side."""
    from .pipelines.flagship import FRAME_H, FRAME_W, FRAMES_PER_VIDEO
    from . import datagen as dgm

    nval = FRAME_W * FRAME_H * 3

    def hof(salt: int) -> str:
        prod = (f"((CAST(fid AS HUGEINT) * 3 + ch) * {dgm.PX_STEP}"
                f" + {salt}) * {dgm.MULT}")
        return _pmod(_s64(prod), dgm.MOD)

    noise_prod = (f"(CAST(fid AS HUGEINT) * {dgm.PX_STEP} + k"
                  f" + {dgm.PX_SALT}) * {dgm.MULT}")
    noise = (f"CAST({_pmod(_pmod(_s64(noise_prod), dgm.MOD), 2 * dgm.PX_NOISE + 1)}"
             f" AS DOUBLE) - {dgm.PX_NOISE}.0")

    return f"""WITH fr AS (
  SELECT doc_id AS video_id,
         UNNEST(generate_series(0, {FRAMES_PER_VIDEO - 1}, 2)) AS fi
  FROM documents
),
f2 AS (
  SELECT video_id, fi, video_id * {FRAMES_PER_VIDEO} + fi AS fid FROM fr
),
px AS (
  SELECT video_id, fi, fid,
         UNNEST(generate_series(0, {nval - 1})) AS k
  FROM f2
),
f AS (
  SELECT video_id, fi, fid, k, (k // 3) AS pix, (k % 3) AS ch FROM px
),
g AS (
  SELECT video_id, fi, fid, k, pix, ch,
         CAST(pix % {FRAME_W} AS DOUBLE) / {FRAME_W - 1}.0 AS x,
         CAST(pix // {FRAME_W} AS DOUBLE) / {FRAME_H - 1}.0 AS y,
         CAST({hof(11)} % 128 AS DOUBLE) AS b128,
         CAST({hof(12)} % 129 AS DOUBLE) AS gx129,
         CAST({hof(13)} % 129 AS DOUBLE) AS gy129,
         CAST({hof(14)} % 33 AS DOUBLE) AS a33,
         CAST({hof(15)} % 2 AS DOUBLE) AS f2x,
         CAST({hof(16)} % 2 AS DOUBLE) AS f2y,
         {noise} AS nf
  FROM f
)
SELECT video_id, fi AS frame_idx,
       CAST(SUM(CAST(least(greatest(round_even(
         (((((gx129 - 64.0) * x) + (64.0 + b128)) + ((gy129 - 64.0) * y))
           + (cos(((1.0 + f2x) * x + (1.0 + f2y) * y) * (2 * pi()))
              * (16.0 + a33))) + nf, 0), 0.0), 255.0) AS BIGINT))
         AS BIGINT) AS lum_sum
FROM g GROUP BY 1, 2 ORDER BY video_id, frame_idx"""


def q_image_thumbs() -> str:
    """Thumbnail-sum census (pipelines/flagship.ImageThumbSums): PNG-only
    pixel replay with the channel kept through the chain; per
    (doc, ch, cell) box sums + counts, the exact integer box filter
    (2s + c) // (2c), then the per-channel sum over the THUMB² cells."""
    from .pipelines.flagship import THUMB
    from . import datagen as dgm

    def hof(salt: int) -> str:
        prod = (f"((CAST(doc_id AS HUGEINT) * 3 + ch) * {dgm.PX_STEP}"
                f" + {salt}) * {dgm.MULT}")
        return _pmod(_s64(prod), dgm.MOD)

    noise_prod = (f"(CAST(doc_id AS HUGEINT) * {dgm.PX_STEP} + k"
                  f" + {dgm.PX_SALT}) * {dgm.MULT}")
    noise = (f"CAST({_pmod(_pmod(_s64(noise_prod), dgm.MOD), 2 * dgm.PX_NOISE + 1)}"
             f" AS DOUBLE) - {dgm.PX_NOISE}.0")

    return f"""WITH img AS (
  SELECT doc_id,
         12 + ({H(7)} % 9) AS w,
         12 + ({H(8)} % 9) AS h
  FROM documents WHERE doc_id % {dgm.FMT_JPEG_MOD} <> 0
),
px AS (
  SELECT doc_id, w, h,
         UNNEST(generate_series(0, w * h * 3 - 1)) AS k
  FROM img
),
f AS (
  SELECT doc_id, w, h, k, (k // 3) AS pix, (k % 3) AS ch FROM px
),
g AS (
  SELECT doc_id, w, h, pix, ch,
         CAST(pix % w AS DOUBLE) / CAST(GREATEST(w - 1, 1) AS DOUBLE) AS x,
         CAST(pix // w AS DOUBLE) / CAST(GREATEST(h - 1, 1) AS DOUBLE) AS y,
         CAST({hof(11)} % 128 AS DOUBLE) AS b128,
         CAST({hof(12)} % 129 AS DOUBLE) AS gx129,
         CAST({hof(13)} % 129 AS DOUBLE) AS gy129,
         CAST({hof(14)} % 33 AS DOUBLE) AS a33,
         CAST({hof(15)} % 2 AS DOUBLE) AS f2x,
         CAST({hof(16)} % 2 AS DOUBLE) AS f2y,
         {noise} AS nf
  FROM f
),
u8c AS (
  SELECT doc_id, w, h, pix, ch,
         CAST(least(greatest(round_even(
           (((((gx129 - 64.0) * x) + (64.0 + b128)) + ((gy129 - 64.0) * y))
             + (cos(((1.0 + f2x) * x + (1.0 + f2y) * y) * (2 * pi()))
                * (16.0 + a33))) + nf, 0), 0.0), 255.0) AS BIGINT) AS val
  FROM g
),
cells AS (
  SELECT doc_id, ch,
         ((pix // w) * {THUMB}) // h AS cy,
         ((pix % w) * {THUMB}) // w AS cx,
         CAST(SUM(val) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM u8c GROUP BY 1, 2, 3, 4
)
SELECT doc_id, ch,
       CAST(SUM((2 * s + c) // (2 * c)) AS BIGINT) AS thumb_sum
FROM cells GROUP BY 1, 2 ORDER BY doc_id, ch"""


def _s64(e: str) -> str:
    """Wrap a HUGEINT expression to signed-64 two's-complement (numpy
    int64 overflow semantics)."""
    U64 = 18446744073709551616
    S63 = 9223372036854775808
    u = f"((({e}) % {U64} + {U64}) % {U64})"
    return f"(CASE WHEN {u} >= {S63} THEN {u} - {U64} ELSE {u} END)"


def _pmod(e: str, m: int) -> str:
    return f"((({e}) % {m} + {m}) % {m})"


def _pixel_u8_cte() -> str:
    """Shared CTE chain ``img → px → f → g → u8`` replaying
    datagen.pixels_of_batch's closed-form pixel field for every PNG doc:
    ``u8(doc_id, w, h, pix, val)`` with val the exact uint8 channel value
    (op order matches the numpy kernel bit-for-bit; numpy-vs-DuckDB libm
    cos is bit-equal on this box — see BASELINE.md corpus pins).  Callers
    append their own CTEs after this fragment."""
    from . import datagen as dgm

    def hof(salt: int) -> str:
        prod = (f"((CAST(doc_id AS HUGEINT) * 3 + ch) * {dgm.PX_STEP}"
                f" + {salt}) * {dgm.MULT}")
        return _pmod(_s64(prod), dgm.MOD)

    noise_prod = (f"(CAST(doc_id AS HUGEINT) * {dgm.PX_STEP} + k"
                  f" + {dgm.PX_SALT}) * {dgm.MULT}")
    noise = (f"CAST({_pmod(_pmod(_s64(noise_prod), dgm.MOD), 2 * dgm.PX_NOISE + 1)}"
             f" AS DOUBLE) - {dgm.PX_NOISE}.0")

    return f"""img AS (
  SELECT doc_id,
         12 + ({H(7)} % 9) AS w,
         12 + ({H(8)} % 9) AS h
  FROM documents WHERE doc_id % {dgm.FMT_JPEG_MOD} <> 0
),
px AS (
  SELECT doc_id, w, h,
         UNNEST(generate_series(0, w * h * 3 - 1)) AS k
  FROM img
),
f AS (
  SELECT doc_id, w, h, k, (k // 3) AS pix, (k % 3) AS ch FROM px
),
g AS (
  SELECT doc_id, w, h, pix,
         CAST(pix % w AS DOUBLE) / CAST(GREATEST(w - 1, 1) AS DOUBLE) AS x,
         CAST(pix // w AS DOUBLE) / CAST(GREATEST(h - 1, 1) AS DOUBLE) AS y,
         CAST({hof(11)} % 128 AS DOUBLE) AS b128,
         CAST({hof(12)} % 129 AS DOUBLE) AS gx129,
         CAST({hof(13)} % 129 AS DOUBLE) AS gy129,
         CAST({hof(14)} % 33 AS DOUBLE) AS a33,
         CAST({hof(15)} % 2 AS DOUBLE) AS f2x,
         CAST({hof(16)} % 2 AS DOUBLE) AS f2y,
         {noise} AS nf
  FROM f
),
u8 AS (
  SELECT doc_id, w, h, pix,
         CAST(least(greatest(round_even(
           (((((gx129 - 64.0) * x) + (64.0 + b128)) + ((gy129 - 64.0) * y))
             + (cos(((1.0 + f2x) * x + (1.0 + f2y) * y) * (2 * pi()))
                * (16.0 + a33))) + nf, 0), 0.0), 255.0) AS BIGINT) AS val
  FROM g
)"""


def q_dhash() -> str:
    """Content dHash (pipelines/flagship.ImageDhash): 9×8 luminance box
    sums+counts of the closed-form pixel field, cross-multiplied
    mean comparisons, bits packed in HUGEINT and wrapped to signed 64."""
    from .pipelines.flagship import DHASH_COLS, DHASH_ROWS

    s64 = _s64

    return f"""WITH {_pixel_u8_cte()},
cells AS (
  SELECT doc_id,
         ((pix // w) * {DHASH_ROWS}) // h AS cy,
         ((pix % w) * {DHASH_COLS}) // w AS cx,
         CAST(SUM(val) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM u8 GROUP BY 1, 2, 3
),
bits AS (
  SELECT a.doc_id, a.cy, a.cx,
         CASE WHEN b.s * a.c > a.s * b.c THEN 1 ELSE 0 END AS bit
  FROM cells a JOIN cells b
    ON a.doc_id = b.doc_id AND a.cy = b.cy AND b.cx = a.cx + 1
  WHERE a.cx < {DHASH_COLS - 1}
)
SELECT doc_id,
       CAST({s64(f"SUM(CAST(bit AS HUGEINT) * (CAST(1 AS HUGEINT) << (cy * {DHASH_COLS - 1} + cx)))")}
            AS BIGINT) AS dhash
FROM bits GROUP BY doc_id ORDER BY doc_id"""


def q_image_hist() -> str:
    """Per-image luminance histogram (pipelines/flagship.ImageHist):
    exact channel-sum luminance per pixel of the closed-form field,
    HIST_BIN_W-wide integer bins, one row per present (doc_id, bin)."""
    from .pipelines.flagship import HIST_BIN_W

    return f"""WITH {_pixel_u8_cte()},
lum AS (
  SELECT doc_id, pix, CAST(SUM(val) AS BIGINT) AS lum
  FROM u8 GROUP BY 1, 2
)
SELECT doc_id, CAST(lum // {HIST_BIN_W} AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lum GROUP BY 1, 2 ORDER BY doc_id, bin"""


def q_time_weighted() -> str:
    """Time-weighted aggregation (queries.q_time_weighted): LEAD window
    per user, half-away cents, floor-div milliseconds — all-integer."""
    return """WITH o AS (
  SELECT user_id,
         epoch_us(ts) AS t,
         CAST(round(value * 100) AS BIGINT) AS c,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t2
  FROM events)
SELECT user_id,
       CAST(SUM(c * ((t2 - t) // 1000)) AS BIGINT) AS num_c_ms,
       CAST(SUM((t2 - t) // 1000) AS BIGINT) AS dur_ms,
       CAST(COUNT(*) AS BIGINT) AS n_iv
FROM o WHERE t2 IS NOT NULL GROUP BY 1 ORDER BY 1"""


def q_track_resample() -> str:
    """Uniform arc-length resampling (stages/tracks.resample_group):
    segment metric and floor(num/len) interpolation replayed via LEAD
    windows + a bracket join; zero-length tracks fall back to their
    first vertex (see the kernel docstring for the exact-floor bound)."""
    from .stages.tracks import RESAMPLE_M

    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
seg0 AS (
  SELECT insee, sidx, doc_id, ix, iy,
         LEAD(ix) OVER w AS nx, LEAD(iy) OVER w AS ny
  FROM xy WINDOW w AS (PARTITION BY insee, sidx ORDER BY doc_id)
),
seg AS (
  SELECT insee, sidx, doc_id, ix, iy, nx, ny,
         CASE WHEN nx IS NULL THEN 0
              ELSE CAST(floor(sqrt(CAST((nx - ix) * (nx - ix)
                                       + (ny - iy) * (ny - iy) AS DOUBLE))
                              + 0.5) AS BIGINT) END AS len,
         COALESCE(CAST(SUM(CASE WHEN nx IS NULL THEN 0
              ELSE CAST(floor(sqrt(CAST((nx - ix) * (nx - ix)
                                       + (ny - iy) * (ny - iy) AS DOUBLE))
                              + 0.5) AS BIGINT) END)
           OVER (PARTITION BY insee, sidx ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS BIGINT), 0) AS cum
  FROM seg0
),
tot AS (
  SELECT insee, sidx,
         CAST(SUM(len) AS BIGINT) AS L,
         MIN(doc_id) AS d0
  FROM seg GROUP BY 1, 2
),
fv AS (
  SELECT t.insee, t.sidx, t.L, s.ix AS fx, s.iy AS fy
  FROM tot t JOIN seg s
    ON s.insee = t.insee AND s.sidx = t.sidx AND s.doc_id = t.d0
),
ks AS (SELECT CAST(unnest(range(0, {RESAMPLE_M})) AS BIGINT) AS k),
tt AS (
  SELECT insee, sidx, k, L, fx, fy, (k * L) // {RESAMPLE_M} AS t
  FROM fv CROSS JOIN ks
)
SELECT tt.insee, tt.sidx, tt.k,
       s.ix + CAST(floor(((s.nx - s.ix) * (tt.t - s.cum)) / s.len)
                   AS BIGINT) AS x_u,
       s.iy + CAST(floor(((s.ny - s.iy) * (tt.t - s.cum)) / s.len)
                   AS BIGINT) AS y_u
FROM tt JOIN seg s
  ON s.insee = tt.insee AND s.sidx = tt.sidx
 AND s.cum <= tt.t AND tt.t < s.cum + s.len
WHERE tt.L > 0
UNION ALL
SELECT insee, sidx, k, fx AS x_u, fy AS y_u
FROM tt WHERE L = 0
ORDER BY insee, sidx, k"""


def q_sssp() -> str:
    """Multi-source weighted shortest paths (queries.q_sssp): unrolled
    Bellman-Ford — exactly SSSP_ROUNDS relaxation CTEs over the exact
    lift-pair edge SQL with integer weights 1_000_000 // c_ab."""
    from .pipelines.queries import SSSP_ROUNDS, SSSP_SEED_MOD, SSSP_W_NUM
    from .stages.pagerank import N_ITEMS

    ctes = []
    prev = "d0"
    for k in range(1, SSSP_ROUNDS + 1):
        ctes.append(f"""d{k} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.d AS node, p.dist + e.w AS dist
    FROM {prev} p JOIN e ON e.s = p.node
  ) GROUP BY node)""")
        prev = f"d{k}"
    chain = ",\n".join(ctes)
    return f"""WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
           % {N_ITEMS} AS item
  FROM events WHERE event_type = 'click'
),
pr AS (
  SELECT a.item AS i, b.item AS j, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM ui a JOIN ui b ON b.user_id = a.user_id AND b.item > a.item
  GROUP BY 1, 2
),
e AS (
  SELECT i AS s, j AS d, {SSSP_W_NUM} // c_ab AS w FROM pr WHERE c_ab >= 2
  UNION ALL
  SELECT j, i, {SSSP_W_NUM} // c_ab FROM pr WHERE c_ab >= 2
),
d0 AS (
  SELECT CAST(unnest(range(0, {N_ITEMS}, {SSSP_SEED_MOD})) AS BIGINT) AS node,
         CAST(0 AS BIGINT) AS dist
),
{chain}
SELECT node AS item, dist FROM {prev} ORDER BY item"""


def q_unpivot() -> str:
    """Distributed melt (queries.q_unpivot): UNION-ALL unpivot of the
    three integer-cents lineitem measures per return flag."""
    return """WITH base AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS rev_c
  FROM lineitem)
SELECT l_returnflag, 'qty_c' AS measure,
       CAST(SUM(qty_c) AS BIGINT) AS value_c FROM base GROUP BY 1
UNION ALL
SELECT l_returnflag, 'price_c', CAST(SUM(price_c) AS BIGINT)
FROM base GROUP BY 1
UNION ALL
SELECT l_returnflag, 'rev_c', CAST(SUM(rev_c) AS BIGINT)
FROM base GROUP BY 1"""


def q_tpch_q5() -> str:
    """TPC-H Q5 shape (queries.q_tpch_q5): plain five-table SQL with the
    tie-free floor(x·100+0.5) integer-cents revenue convention."""
    from .pipelines.queries import _Q5_D0_US, _Q5_D1_US, _Q5_REGION

    d0, d1 = _Q5_D0_US // 1_000_000, _Q5_D1_US // 1_000_000
    return f"""SELECT n.n_name AS n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS rev_c
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
              AND s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = {_q(_Q5_REGION)}
  AND o.o_orderdate >= to_timestamp({d0})
  AND o.o_orderdate < to_timestamp({d1})
GROUP BY 1 ORDER BY rev_c DESC, n_name"""


def q_tpch_q7() -> str:
    """TPC-H Q7 shape (queries.q_tpch_q7): plain ANSI star join with the
    engine's tie-free floor(x+0.5) cents and the same nation pair."""
    from .pipelines.queries import _Q7_NATIONS, _Q7_Y0, _Q7_Y1

    n1, n2 = _Q7_NATIONS
    return f"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(date_part('year', l.l_shipdate) AS BIGINT) AS year,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE sn.n_name IN ('{n1}', '{n2}')
  AND cn.n_name IN ('{n1}', '{n2}')
  AND sn.n_name <> cn.n_name
  AND date_part('year', l.l_shipdate) BETWEEN {_Q7_Y0} AND {_Q7_Y1}
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


def q_tpch_q9() -> str:
    """TPC-H Q9 shape (queries.q_tpch_q9): plain ANSI broadcast star with
    the tie-free cents."""
    from .pipelines.queries import _Q9_TYPE

    return f"""SELECT n.n_name AS supp_nation,
       CAST(date_part('year', l.l_shipdate) AS BIGINT) AS year,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = '{_Q9_TYPE}'
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_json_props() -> str:
    """JSON props extraction (queries.q_json_props): DuckDB's real JSON
    parser vs the engine's RE2 pass — an independent implementation."""
    return """SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1 ORDER BY 1"""


def q_image_entropy() -> str:
    """Per-image histogram entropy (pipelines/flagship.ImageEntropy):
    exact integer 16-bin counts of the closed-form pixel field, then a
    FIXED 16-term left-assoc entropy chain (the engine's left-fold in
    ascending bin order) rounded to 6 dp on both sides."""
    from .pipelines.flagship import HIST_BIN_W

    nbins = 765 // HIST_BIN_W + 1
    cs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN bin = {b} THEN n ELSE 0 END) AS BIGINT) AS c{b}"
        for b in range(nbins))
    es = " + ".join(
        f"(CASE WHEN c{b} > 0 THEN -((c{b} / nn) * log2(c{b} / nn)) "
        f"ELSE 0.0 END)" for b in range(nbins))
    return f"""WITH {_pixel_u8_cte()},
lum AS (
  SELECT doc_id, pix, CAST(SUM(val) AS BIGINT) AS lum
  FROM u8 GROUP BY 1, 2
),
hist AS (
  SELECT doc_id, CAST(lum // {HIST_BIN_W} AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lum GROUP BY 1, 2
),
piv AS (
  SELECT doc_id,
         CAST(SUM(n) AS DOUBLE) AS nn,
         {cs}
  FROM hist GROUP BY 1
)
SELECT doc_id, round({es}, 6) AS entropy
FROM piv ORDER BY doc_id"""


def q_bm25() -> str:
    """BM25 top-20 (queries.q_bm25): same single-space tokenization,
    same Okapi expression in the same left-assoc term order, same
    round-6 and (score DESC, doc_id) cut."""
    from .pipelines.queries import BM25_B, BM25_K1, BM25_TERMS, BM25_TOPK

    tl = _slist(BM25_TERMS)
    k1 = f"CAST({BM25_K1} AS DOUBLE)"
    b = f"CAST({BM25_B} AS DOUBLE)"
    score = " + ".join(
        f"(idf{j} * (tf{j} * ({k1} + 1.0)) / "
        f"(tf{j} + {k1} * (1.0 - {b} + {b} * dl / avgdl)))"
        for j in range(len(BM25_TERMS)))
    tfs = ",\n         ".join(
        f"CAST(len(list_filter(toks, x -> x = {_q(t)})) AS DOUBLE) AS tf{j}"
        for j, t in enumerate(BM25_TERMS))
    dfs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{j}"
        for j in range(len(BM25_TERMS)))
    idfs = ",\n         ".join(
        f"ln(1.0 + (n_docs - df{j} + 0.5) / (df{j} + 0.5)) AS idf{j}"
        for j in range(len(BM25_TERMS)))
    anytf = " OR ".join(f"tf{j} > 0" for j in range(len(BM25_TERMS)))
    return f"""WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
per_doc AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS dl,
         {tfs}
  FROM tok
),
corpus AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
         {dfs}
  FROM per_doc
),
consts AS (
  SELECT n_docs, avgdl,
         {idfs}
  FROM corpus
)
SELECT doc_id, round({score}, 6) AS score
FROM per_doc, consts
WHERE {anytf}
ORDER BY round({score}, 6) DESC, doc_id
LIMIT {BM25_TOPK}"""


def q_image_mips() -> str:
    """Mip-pyramid census (pipelines/flagship.ImageMips): per (doc,
    level) the 2^L-box cell count and the exact integer sum of per-cell
    floor-averaged luminance of the closed-form pixel field."""
    from .pipelines.flagship import MIP_LEVELS

    lvls = " UNION ALL ".join(f"SELECT {v} AS lvl" for v in MIP_LEVELS)
    return f"""WITH {_pixel_u8_cte()},
lum AS (
  SELECT doc_id, w, pix, CAST(SUM(val) AS BIGINT) AS lum
  FROM u8 GROUP BY 1, 2, 3
),
lev AS ({lvls}),
cells AS (
  SELECT doc_id, lvl,
         (pix // w) // (1 << lvl) AS cy,
         (pix % w) // (1 << lvl) AS cx,
         CAST(SUM(lum) AS BIGINT) AS cs,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lum CROSS JOIN lev
  GROUP BY 1, 2, 3, 4
)
SELECT doc_id, CAST(lvl AS BIGINT) AS lvl, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(cs // cnt) AS BIGINT) AS s_avg
FROM cells GROUP BY 1, 2 ORDER BY doc_id, lvl"""


def q_rrf_fusion() -> str:
    """Reciprocal-rank fusion (queries.q_rrf_fusion): the q_bm25 and
    q_quality oracles as ranked subqueries, FULL OUTER JOIN on doc_id,
    rrf = 1/(K+r) + 1/(K+r) with COALESCE(…, 0) for absent ranks —
    identical double evaluation order to the engine."""
    from .pipelines.queries import BM25_TOPK, RRF_K, RRF_TOPK
    from .stages.text import EN_MARKERS, FR_MARKERS, PUNCT

    punct = " + ".join(_occ("text", ch) for ch in PUNCT)
    stop = " + ".join(_occ("lower(text)", p) for p in EN_MARKERS + FR_MARKERS)
    bm25_sql = q_bm25()
    return f"""WITH bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM ({bm25_sql})
),
qv AS (
  SELECT doc_id,
         round(ln(CAST(length(text) AS DOUBLE) + 1.0) * 0.25
               + (CAST(({stop}) AS DOUBLE)
                    / CAST(greatest({_NTOK}, 1) AS DOUBLE) * 2.0
                  - CAST(({punct}) AS DOUBLE)
                    / CAST(greatest(length(text), 1) AS DOUBLE) * 3.0), 6)
           AS quality
  FROM documents
),
qt AS (
  SELECT doc_id, row_number() OVER (ORDER BY quality DESC, doc_id) AS r
  FROM (SELECT doc_id, quality FROM qv
        ORDER BY quality DESC, doc_id LIMIT {BM25_TOPK})
),
fused AS (
  SELECT COALESCE(bm.doc_id, qt.doc_id) AS doc_id,
         round(COALESCE(1.0 / ({RRF_K} + bm.r), 0.0)
               + COALESCE(1.0 / ({RRF_K} + qt.r), 0.0), 9) AS rrf,
         CAST(COALESCE(bm.r, 0) AS BIGINT) AS r_bm25,
         CAST(COALESCE(qt.r, 0) AS BIGINT) AS r_quality
  FROM bm FULL OUTER JOIN qt ON bm.doc_id = qt.doc_id
)
SELECT doc_id, rrf, r_bm25, r_quality
FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPK}"""


def q_image_equalize() -> str:
    """Equalization census (pipelines/flagship.ImageEqualize): per-doc
    value histogram of the closed-form pixel field, window cumsum cdf,
    the tie-free integer remap, and the exact summaries."""
    return f"""WITH {_pixel_u8_cte()},
ieq_h AS (
  SELECT doc_id, val, CAST(COUNT(*) AS BIGINT) AS c
  FROM u8 GROUP BY 1, 2
),
ieq_n AS (SELECT doc_id, CAST(w * h * 3 AS BIGINT) AS n FROM img),
ieq_cd AS (
  SELECT doc_id, val, c,
         SUM(c) OVER (PARTITION BY doc_id ORDER BY val
                      ROWS UNBOUNDED PRECEDING) AS cdf
  FROM ieq_h
),
ieq_m AS (SELECT doc_id, MIN(cdf) AS m FROM ieq_cd GROUP BY 1),
ieq_o AS (
  SELECT cd.doc_id, cd.val, cd.c,
         CASE WHEN nn.n = mm.m THEN 0
              ELSE (2 * 255 * (cd.cdf - mm.m) + (nn.n - mm.m))
                   // (2 * (nn.n - mm.m)) END AS ov
  FROM ieq_cd cd
  JOIN ieq_m mm ON mm.doc_id = cd.doc_id
  JOIN ieq_n nn ON nn.doc_id = cd.doc_id
)
SELECT doc_id,
       CAST(SUM(c * ov) AS BIGINT) AS eq_sum,
       CAST(MIN(ov) AS BIGINT) AS eq_min,
       CAST(MAX(ov) AS BIGINT) AS eq_max,
       CAST(SUM(c) AS BIGINT) AS n_vals
FROM ieq_o GROUP BY 1 ORDER BY 1"""


def q_sobel_energy() -> str:
    """Per-image gradient energy (pipelines/flagship.ImageSobel): exact
    integer Σ|Δlum| along x (same row, pix+1) and along y (pix+w) of the
    closed-form pixel field, via pixel-index self-joins."""
    return f"""WITH {_pixel_u8_cte()},
lum AS (
  SELECT doc_id, w, pix, CAST(SUM(val) AS BIGINT) AS lum
  FROM u8 GROUP BY 1, 2, 3
),
gx AS (
  SELECT a.doc_id, CAST(SUM(ABS(b.lum - a.lum)) AS BIGINT) AS gx_energy
  FROM lum a JOIN lum b
    ON a.doc_id = b.doc_id AND b.pix = a.pix + 1
  WHERE (a.pix % a.w) < a.w - 1
  GROUP BY 1
),
gy AS (
  SELECT a.doc_id, CAST(SUM(ABS(b.lum - a.lum)) AS BIGINT) AS gy_energy
  FROM lum a JOIN lum b
    ON a.doc_id = b.doc_id AND b.pix = a.pix + a.w
  GROUP BY 1
)
SELECT gx.doc_id, gx.gx_energy, gy.gy_energy
FROM gx JOIN gy ON gy.doc_id = gx.doc_id ORDER BY gx.doc_id"""


def q_langid_confusion() -> str:
    """Language-ID confusion matrix (queries.q_langid_confusion): the
    q_langid marker heuristic grouped against the labeled lang."""
    from .stages.text import EN_MARKERS, FR_MARKERS

    en = " + ".join(_occ("lower(text)", p) for p in EN_MARKERS)
    fr = " + ".join(_occ("lower(text)", p) for p in FR_MARKERS)
    return f"""SELECT lang,
       (CASE WHEN ({en}) > ({fr}) THEN 'en'
             WHEN ({fr}) > ({en}) THEN 'fr' ELSE 'und' END) AS lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2 ORDER BY 1, 2"""


def q_od_matrix() -> str:
    """OD flow matrix (stages/tracks.od_matrix): per-track endpoints via
    arg_min/arg_max over doc_id (unique per row → deterministic), cells
    as the identical clamp-then-scale BIGINT chain (nonneg, so // is
    floor on both sides)."""
    from .stages.tracks import (OD_RES, _LAT0_U, _LON0_U, _SPANX_U,
                                _SPANY_U)

    def cell(ix: str, iy: str) -> str:
        cx = (f"((least(greatest({ix} - ({_LON0_U}), 0), {_SPANX_U - 1})"
              f" * {OD_RES}) // {_SPANX_U})")
        cy = (f"((least(greatest({iy} - ({_LAT0_U}), 0), {_SPANY_U - 1})"
              f" * {OD_RES}) // {_SPANY_U})")
        return f"({cx} * {OD_RES} + {cy})"

    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
tr AS (
  SELECT insee, sidx,
         arg_min(ix, doc_id) AS oix, arg_min(iy, doc_id) AS oiy,
         arg_max(ix, doc_id) AS dix, arg_max(iy, doc_id) AS diy
  FROM xy GROUP BY 1, 2
)
SELECT {cell('oix', 'oiy')} AS o_cell, {cell('dix', 'diy')} AS d_cell,
       CAST(COUNT(*) AS BIGINT) AS n_tracks
FROM tr GROUP BY 1, 2 ORDER BY 1, 2"""


def q_speed_spikes() -> str:
    """GPS spike census (stages/tracks.speed_spikes): exact int64
    squared-step comparison for the spike flag; reported max step uses
    the shared floor(sqrt+0.5) integer metric."""
    from .stages.tracks import _SPIKE_T2

    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
seg AS (
  SELECT insee, sidx,
         (ix - LAG(ix) OVER w) AS dx, (iy - LAG(iy) OVER w) AS dy
  FROM xy WINDOW w AS (PARTITION BY insee, sidx ORDER BY doc_id)
)
SELECT insee, sidx,
       CAST(SUM(CASE WHEN dx*dx + dy*dy > {_SPIKE_T2} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_spikes,
       CAST(MAX(CAST(floor(sqrt(CAST(dx*dx + dy*dy AS DOUBLE)) + 0.5)
                     AS BIGINT)) AS BIGINT) AS max_step_u
FROM seg WHERE dx IS NOT NULL
GROUP BY 1, 2
HAVING SUM(CASE WHEN dx*dx + dy*dy > {_SPIKE_T2} THEN 1 ELSE 0 END) > 0
ORDER BY 1, 2"""


def q_hex_cells() -> str:
    """Axial hex binning (geo/cells.hex_qr): the identical pinned-double
    chain — basis constants embedded by repr, cube rounding with
    floor(v+0.5), largest-residual fixup as the same strict-> CASE."""
    from .geo.cells import HEX_A, HEX_B, HEX_C, HEX_SIZE

    return f"""WITH {base_pts_cte()},
hf AS (
  SELECT doc_id,
         ((lon * {HEX_A!r}) - (lat * {HEX_B!r})) / {HEX_SIZE!r} AS q,
         (lat * {HEX_C!r}) / {HEX_SIZE!r} AS r
  FROM pts2
),
hs AS (SELECT doc_id, q, r, ((0.0 - q) - r) AS s FROM hf),
hr AS (
  SELECT doc_id, q, r, s,
         floor(q + 0.5) AS rq, floor(r + 0.5) AS rr, floor(s + 0.5) AS rs
  FROM hs
),
hd AS (
  SELECT doc_id, rq, rr, rs,
         abs(rq - q) AS dq, abs(rr - r) AS dr, abs(rs - s) AS ds
  FROM hr
),
hx AS (
  SELECT doc_id,
         CAST(CASE WHEN dq > dr AND dq > ds THEN (0.0 - rr) - rs
                   ELSE rq END AS BIGINT) AS hexq,
         CAST(CASE WHEN NOT (dq > dr AND dq > ds) AND dr > ds
                   THEN (0.0 - rq) - rs ELSE rr END AS BIGINT) AS hexr
  FROM hd
)
SELECT hexq, hexr, CAST(COUNT(*) AS BIGINT) AS n_points
FROM hx GROUP BY 1, 2 ORDER BY 1, 2"""


def q_big_orders() -> str:
    """TPC-H Q18 shape (queries.q_big_orders): integral-double quantities
    sum as exact BIGINTs; order total price to tie-free cents."""
    from .pipelines.queries import _Q18_MIN_QTY

    return f"""WITH oq AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > {_Q18_MIN_QTY}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_c,
       oq.sum_qty
FROM oq JOIN orders o ON o.o_orderkey = oq.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_orderkey"""


def q_pad_waste() -> str:
    """Padding-waste census (queries.q_pad_waste): next-pow2 bucket as an
    integer CASE chain (the engine's frexp bit-length is exact, so the
    chain matches bit-for-bit)."""
    from .pipelines.queries import _PAD_MAX_POW

    chain = " ".join(
        f"WHEN n <= {1 << p} THEN {1 << p}"
        for p in range(_PAD_MAX_POW + 1))
    return f"""WITH tok AS (
  SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n FROM documents
),
bk AS (
  SELECT n, (CASE {chain} ELSE {1 << _PAD_MAX_POW} END) AS bucket FROM tok
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS sum_tokens,
       CAST(bucket * COUNT(*) - SUM(n) AS BIGINT) AS pad_waste
FROM bk GROUP BY bucket ORDER BY 1"""


def q_knn_graph() -> str:
    """Bounded-radius kNN graph (stages/spatial.knn_graph): exact int64 µ°
    distances; rank = ROW_NUMBER over (d2, nbr_id) — total order, so the
    grid-bucketed engine matches bit-for-bit."""
    from .pipelines.queries import KNN_GRAPH_K, KNN_GRAPH_R_U

    r2 = KNN_GRAPH_R_U * KNN_GRAPH_R_U
    return f"""WITH {base_pts_cte()},
xy AS (
  SELECT doc_id,
         CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS ix,
         CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS iy
  FROM pts2
),
pairs AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS nbr_id,
         (a.ix - b.ix) * (a.ix - b.ix)
         + (a.iy - b.iy) * (a.iy - b.iy) AS d2_u
  FROM xy a JOIN xy b
    ON b.doc_id <> a.doc_id
   AND abs(a.ix - b.ix) <= {KNN_GRAPH_R_U}
   AND abs(a.iy - b.iy) <= {KNN_GRAPH_R_U}
  WHERE (a.ix - b.ix) * (a.ix - b.ix)
        + (a.iy - b.iy) * (a.iy - b.iy) <= {r2}
),
r AS (
  SELECT doc_id, nbr_id, d2_u,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY d2_u, nbr_id) AS rank
  FROM pairs
)
SELECT doc_id, rank, nbr_id, d2_u FROM r
WHERE rank <= {KNN_GRAPH_K} ORDER BY doc_id, rank"""


def q_rolling_window() -> str:
    """Bounded window frame (stages/window.rolling_frame): tie-free cents,
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW sum + frame row count."""
    from .stages.window import ROLL_FRAME

    return f"""WITH ev AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {ROLL_FRAME - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS roll_c,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {ROLL_FRAME - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_frame
FROM ev ORDER BY user_id, event_id"""


def q_pmi_assoc() -> str:
    """PMI association (queries.q_pmi_assoc): identical double chain —
    (n·N)/(n_lang·n_src) then ln, round 6."""
    return """WITH ct AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
m AS (
  SELECT lang, source, n,
         CAST(SUM(n) OVER () AS DOUBLE) AS nn,
         CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE) AS nl,
         CAST(SUM(n) OVER (PARTITION BY source) AS DOUBLE) AS ns
  FROM ct
)
SELECT lang, source, n,
       round(ln((CAST(n AS DOUBLE) * nn) / (nl * ns)), 6) AS pmi
FROM m ORDER BY lang, source"""


def q_range_frame() -> str:
    """RANGE value-window frame (stages/window.range_frame): numeric RANGE
    over epoch-µs — peers with equal ts are all in-frame on both sides."""
    from .stages.window import RANGE_FRAME_US

    return f"""WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
)
SELECT event_id, user_id,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY tus
            RANGE BETWEEN {RANGE_FRAME_US} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_1h
FROM ev ORDER BY user_id, event_id"""


def q_knn_classify() -> str:
    """kNN majority-vote zone classifier (queries.q_knn_classify): the
    exact q_knn_graph candidate set, neighbor zones re-derived from pts2,
    mode via (count DESC, insee ASC) ROW_NUMBER — total tie order."""
    from .pipelines.queries import KNN_GRAPH_K, KNN_GRAPH_R_U

    r2 = KNN_GRAPH_R_U * KNN_GRAPH_R_U
    return f"""WITH {base_pts_cte()},
xy AS (
  SELECT doc_id, insee,
         CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS ix,
         CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS iy
  FROM pts2
),
pairs AS (
  SELECT a.doc_id AS doc_id, a.insee AS own_insee,
         b.doc_id AS nbr_id, b.insee AS nbr_insee,
         (a.ix - b.ix) * (a.ix - b.ix)
         + (a.iy - b.iy) * (a.iy - b.iy) AS d2_u
  FROM xy a JOIN xy b
    ON b.doc_id <> a.doc_id
   AND abs(a.ix - b.ix) <= {KNN_GRAPH_R_U}
   AND abs(a.iy - b.iy) <= {KNN_GRAPH_R_U}
  WHERE (a.ix - b.ix) * (a.ix - b.ix)
        + (a.iy - b.iy) * (a.iy - b.iy) <= {r2}
),
r AS (
  SELECT doc_id, own_insee, nbr_insee, d2_u,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY d2_u, nbr_id) AS rnk
  FROM pairs
),
cnts AS (
  SELECT doc_id, own_insee, nbr_insee, COUNT(*) AS c
  FROM r WHERE rnk <= {KNN_GRAPH_K}
  GROUP BY 1, 2, 3
),
pick AS (
  SELECT doc_id, own_insee, nbr_insee, c,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY c DESC, nbr_insee) AS rn,
         SUM(c) OVER (PARTITION BY doc_id) AS n_nbrs
  FROM cnts
)
SELECT doc_id, nbr_insee AS pred_insee,
       CAST(n_nbrs AS BIGINT) AS n_nbrs,
       CAST(CASE WHEN nbr_insee = own_insee THEN 1 ELSE 0 END AS BIGINT)
         AS self_match
FROM pick WHERE rn = 1 ORDER BY doc_id"""


def q_ab_ztest() -> str:
    """Welch z census (queries.q_ab_ztest): identical pinned double chain
    over exact integer moments; complement side via window totals."""
    return """WITH mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                  * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY 1
),
tot AS (
  SELECT event_type, n, s, s2,
         CAST(SUM(n) OVER () AS DOUBLE) - CAST(n AS DOUBLE) AS n2,
         CAST(SUM(s) OVER () AS DOUBLE) - CAST(s AS DOUBLE) AS s2_,
         CAST(SUM(s2) OVER () AS DOUBLE) - CAST(s2 AS DOUBLE) AS q2
  FROM mom
),
fin AS (
  SELECT event_type, n,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
         s2_ / n2 AS m2,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS v1,
         q2 / n2 - (s2_ / n2) * (s2_ / n2) AS v2,
         CAST(n AS DOUBLE) AS n1d, n2
  FROM tot
)
SELECT event_type, n,
       round(m1, 6) AS mean_c,
       round((m1 - m2) / sqrt(v1 / n1d + v2 / n2), 6) AS z
FROM fin ORDER BY event_type"""


def q_track_hausdorff() -> str:
    """Stride-sampled symmetric Hausdorff between adjacent street tracks
    (stages/tracks.hausdorff_pairs): per-track row_number stride sample,
    LEAD-paired consecutive sidx per zone, MIN/MAX on exact BIGINT squared
    distances, floor(sqrt+0.5) applied once at the end (it commutes with
    the monotone reductions — the engine relies on the same identity)."""
    from .stages.tracks import HAUSDORFF_STRIDE

    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
rn AS (
  SELECT insee, sidx, doc_id, ix, iy,
         row_number() OVER (PARTITION BY insee, sidx ORDER BY doc_id) - 1
           AS rn
  FROM xy
),
samp AS (SELECT insee, sidx, doc_id, ix, iy FROM rn
         WHERE rn % {HAUSDORFF_STRIDE} = 0),
streets AS (SELECT DISTINCT insee, sidx FROM samp),
pairs AS (
  SELECT insee, sidx AS sidx_a,
         LEAD(sidx) OVER (PARTITION BY insee ORDER BY sidx) AS sidx_b
  FROM streets
),
p2 AS (SELECT * FROM pairs WHERE sidx_b IS NOT NULL),
ab AS (
  SELECT p.insee, p.sidx_a, p.sidx_b, a.doc_id,
         MIN((a.ix - b.ix) * (a.ix - b.ix)
           + (a.iy - b.iy) * (a.iy - b.iy)) AS m2
  FROM p2 p
  JOIN samp a ON a.insee = p.insee AND a.sidx = p.sidx_a
  JOIN samp b ON b.insee = p.insee AND b.sidx = p.sidx_b
  GROUP BY 1, 2, 3, 4
),
ba AS (
  SELECT p.insee, p.sidx_a, p.sidx_b, b.doc_id,
         MIN((a.ix - b.ix) * (a.ix - b.ix)
           + (a.iy - b.iy) * (a.iy - b.iy)) AS m2
  FROM p2 p
  JOIN samp a ON a.insee = p.insee AND a.sidx = p.sidx_a
  JOIN samp b ON b.insee = p.insee AND b.sidx = p.sidx_b
  GROUP BY 1, 2, 3, 4
),
hab AS (SELECT insee, sidx_a, sidx_b, MAX(m2) AS h2 FROM ab GROUP BY 1, 2, 3),
hba AS (SELECT insee, sidx_a, sidx_b, MAX(m2) AS h2 FROM ba GROUP BY 1, 2, 3)
SELECT hab.insee, hab.sidx_a, hab.sidx_b,
       CAST(floor(sqrt(CAST(hab.h2 AS DOUBLE)) + 0.5) AS BIGINT) AS h_ab_u,
       CAST(floor(sqrt(CAST(hba.h2 AS DOUBLE)) + 0.5) AS BIGINT) AS h_ba_u,
       CAST(floor(sqrt(CAST(greatest(hab.h2, hba.h2) AS DOUBLE)) + 0.5)
         AS BIGINT) AS haus_u
FROM hab JOIN hba ON hab.insee = hba.insee AND hab.sidx_a = hba.sidx_a
                 AND hab.sidx_b = hba.sidx_b
ORDER BY hab.insee, hab.sidx_a"""


def q_geofence() -> str:
    """Geofence enter/exit transitions (stages/tracks.geofence_events):
    exact BIGINT circle membership against the zone-center fence (center
    = floor((LON0 + (zx+0.5)·SPAN/N)·1e6 + 0.5), the numpy op order),
    LAG over (insee, sidx, doc_id) for the transition rows."""
    from .stages.tracks import GEOFENCE_R_U

    r2 = GEOFENCE_R_U * GEOFENCE_R_U
    cx = (f"CAST(floor(({dg.LON0!r} + ((CAST(insee AS BIGINT) - 1)"
          f" // {dg.NZY} + 0.5) * {dg.LON_SPAN!r} / {dg.NZX})"
          f" * 1000000.0 + 0.5) AS BIGINT)")
    cy = (f"CAST(floor(({dg.LAT0!r} + ((CAST(insee AS BIGINT) - 1)"
          f" % {dg.NZY} + 0.5) * {dg.LAT_SPAN!r} / {dg.NZY})"
          f" * 1000000.0 + 0.5) AS BIGINT)")
    return f"""WITH {base_pts_cte()},
{_TRACK_XY},
flg AS (
  SELECT insee, sidx, doc_id,
         ((ix - {cx}) * (ix - {cx}) + (iy - {cy}) * (iy - {cy})
           <= {r2}) AS inside
  FROM xy
),
tr AS (
  SELECT insee, sidx, doc_id, inside,
         LAG(inside) OVER (PARTITION BY insee, sidx ORDER BY doc_id)
           AS pinside
  FROM flg
)
SELECT insee, sidx, doc_id,
       CASE WHEN inside THEN 'enter' ELSE 'exit' END AS event
FROM tr WHERE pinside IS NOT NULL AND inside <> pinside
ORDER BY insee, sidx, doc_id"""


def q_aspect_buckets() -> str:
    """Aspect-ratio bucketing (stages/imagemeta.aspect_buckets): the
    engine parses dims from real PNG/JPEG bytes; the oracle replays the
    generative dims closed-form, snaps by the exact integer
    cross-multiplication metric with ties to the lowest bucket_id."""
    from .stages.imagemeta import ASPECT_BUCKETS

    vals = ", ".join(f"({i}, {bw}, {bh})" for i, bw, bh in ASPECT_BUCKETS)
    return f"""WITH dims AS (
  SELECT doc_id, CAST(12 + ({H(7)} % 9) AS BIGINT) AS w,
         CAST(12 + ({H(8)} % 9) AS BIGINT) AS h
  FROM documents
),
b(bucket_id, bw, bh) AS (VALUES {vals}),
scored AS (
  SELECT d.doc_id, b.bucket_id, b.bw, b.bh, d.w * d.h AS px,
         row_number() OVER (PARTITION BY d.doc_id
                            ORDER BY abs(d.w * b.bh - b.bw * d.h),
                                     b.bucket_id) AS rnk
  FROM dims d CROSS JOIN b
)
SELECT CAST(bucket_id AS BIGINT) AS bucket_id, CAST(bw AS BIGINT) AS bw,
       CAST(bh AS BIGINT) AS bh, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(px) AS BIGINT) AS sum_pixels
FROM scored WHERE rnk = 1 GROUP BY 1, 2, 3 ORDER BY bucket_id"""


def q_raster_components() -> str:
    """Raster→vector blobs (stages/rastervec.raster_components): the
    zone_of-style floor/clip cell id at raster resolution, occupancy with
    the threshold, right/down 4-adjacency edges, recursive min-label
    closure (the q_dup_clusters pattern), COALESCE self-label for
    singleton cells, per-component bbox aggregate."""
    from .stages.rastervec import RV_GX, RV_GY, RV_MIN_COUNT

    gx = (f"CAST(least(greatest(floor((lon - {dg.LON0}) / {dg.LON_SPAN}"
          f" * {RV_GX}), 0), {RV_GX - 1}) AS BIGINT)")
    gy = (f"CAST(least(greatest(floor((lat - {dg.LAT0}) / {dg.LAT_SPAN}"
          f" * {RV_GY}), 0), {RV_GY - 1}) AS BIGINT)")
    return f"""WITH RECURSIVE {base_pts_cte()},
gc AS (SELECT {gx} * {RV_GY} + {gy} AS cell FROM pts2),
occ AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM gc
  GROUP BY 1 HAVING COUNT(*) >= {RV_MIN_COUNT}
),
e0 AS (
  SELECT a.cell AS a, b.cell AS b FROM occ a
  JOIN occ b ON b.cell = a.cell + 1 WHERE a.cell % {RV_GY} <> {RV_GY - 1}
  UNION ALL
  SELECT a.cell AS a, b.cell AS b FROM occ a
  JOIN occ b ON b.cell = a.cell + {RV_GY}
),
cc_e AS (
  SELECT a, b FROM e0 UNION SELECT b, a FROM e0
  UNION SELECT a, a FROM e0 UNION SELECT b, b FROM e0
),
cc_r AS (
  SELECT a AS node, b AS r FROM cc_e
  UNION
  SELECT cc_r.node, e.b FROM cc_r JOIN cc_e e ON cc_r.r = e.a
),
labels AS (SELECT node, MIN(r) AS label FROM cc_r GROUP BY node),
lab2 AS (
  SELECT occ.cell, occ.n, COALESCE(l.label, occ.cell) AS label
  FROM occ LEFT JOIN labels l ON l.node = occ.cell
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(n) AS BIGINT) AS n_points,
       MIN(cell // {RV_GY}) AS gx_min, MAX(cell // {RV_GY}) AS gx_max,
       MIN(cell % {RV_GY}) AS gy_min, MAX(cell % {RV_GY}) AS gy_max
FROM lab2 GROUP BY 1 ORDER BY label"""


def q_map_match() -> str:
    """Viterbi map-matching (stages/mapmatch.py): OFFSET-shifted BIGINT
    coords (so SUM // COUNT floor-divides identically in numpy and
    DuckDB), per-zone candidate centroids, emission lists ordered by
    candidate sidx, and the DP as a recursive CTE over cost lists —
    new_costs[i] = emis[i] + least(prev[i], list_min(prev) + P).
    First-occurrence list_position = numpy first-min argmin."""
    from .stages.mapmatch import MM_OFF, MM_SWITCH_P

    return f"""WITH RECURSIVE {base_pts_cte()},
{_TRACK_XY},
u AS (
  SELECT insee, sidx, doc_id, ix + {MM_OFF} AS ux, iy + {MM_OFF} AS uy
  FROM xy
),
cen AS (
  SELECT insee, sidx, SUM(ux) // COUNT(*) AS cx, SUM(uy) // COUNT(*) AS cy
  FROM u GROUP BY 1, 2
),
ptr AS (
  SELECT insee, sidx, ux, uy,
         row_number() OVER (PARTITION BY insee, sidx ORDER BY doc_id) AS t
  FROM u
),
emis AS (
  SELECT p.insee, p.sidx, p.t, c.sidx AS s,
         (p.ux - c.cx) * (p.ux - c.cx)
           + (p.uy - c.cy) * (p.uy - c.cy) AS e
  FROM ptr p JOIN cen c ON c.insee = p.insee
),
el AS (
  SELECT insee, sidx, t, list(e ORDER BY s) AS ev, list(s ORDER BY s) AS sl
  FROM emis GROUP BY 1, 2, 3
),
rec AS (
  SELECT insee, sidx, t, ev AS costs FROM el WHERE t = 1
  UNION ALL
  SELECT e.insee, e.sidx, e.t,
         list_transform(range(1, len(e.ev) + 1),
           i -> e.ev[i] + least(r.costs[i],
                                list_min(r.costs) + {MM_SWITCH_P}))
  FROM rec r JOIN el e
    ON e.insee = r.insee AND e.sidx = r.sidx AND e.t = r.t + 1
),
fin AS (SELECT insee, sidx, MAX(t) AS n_pts FROM rec GROUP BY 1, 2),
last AS (
  SELECT r.insee, r.sidx, f.n_pts, r.costs
  FROM rec r JOIN fin f
    ON f.insee = r.insee AND f.sidx = r.sidx AND f.n_pts = r.t
)
SELECT l.insee, l.sidx, CAST(l.n_pts AS BIGINT) AS n_pts,
       CAST(list_min(l.costs) AS BIGINT) AS best_cost,
       CAST(e.sl[list_position(l.costs, list_min(l.costs))] AS BIGINT)
         AS match_sidx
FROM last l JOIN el e
  ON e.insee = l.insee AND e.sidx = l.sidx AND e.t = l.n_pts
ORDER BY l.insee, l.sidx"""


def q_source_diversity() -> str:
    """Per-zone source-mix diversity (queries.q_source_diversity): HUGEINT
    intermediates for n² (the engine finish uses Python ints — both exact
    past int64), `//` floor division on non-negative values."""
    return f"""WITH {base_pts_cte()},
sc AS (
  SELECT insee, (doc_id % 4) AS src, CAST(COUNT(*) AS BIGINT) AS c
  FROM pts2 GROUP BY 1, 2
),
z AS (
  SELECT insee, SUM(c) AS n, SUM(CAST(c AS HUGEINT) * c) AS sq,
         COUNT(*) AS n_sources, MAX(c) AS mx
  FROM sc GROUP BY 1
)
SELECT insee, CAST(n AS BIGINT) AS n_points,
       CAST(n_sources AS BIGINT) AS n_sources,
       CAST((CAST(n AS HUGEINT) * n - sq) * 1000000
              // (CAST(n AS HUGEINT) * n) AS BIGINT) AS gini_ppm,
       CAST(CAST(mx AS HUGEINT) * 1000000 // n AS BIGINT) AS top_share_ppm
FROM z ORDER BY insee"""


def q_iou_eval() -> str:
    """Detection-eval census (queries.q_iou_eval): the same closed-form
    hash boxes, the exact 2·inter ≥ union half-IoU test, floor'd
    iou_milli — all BIGINT."""
    from .pipelines.queries import IOU_GRID

    g = IOU_GRID
    return f"""WITH {base_pts_cte()},
bx AS (
  SELECT insee,
         {H(11)} % {g} AS xg, {H(12)} % {g} AS yg,
         20 + {H(13)} % 30 AS wg, 20 + {H(14)} % 30 AS hg,
         ({H(11)} % {g}) + {H(15)} % 21 - 10 AS xp,
         ({H(12)} % {g}) + {H(16)} % 21 - 10 AS yp,
         20 + {H(17)} % 30 AS wp, 20 + {H(18)} % 30 AS hp
  FROM pts2
),
m AS (
  SELECT insee, wg, hg, wp, hp,
         greatest(0, least(xg + wg, xp + wp) - greatest(xg, xp)) AS iw,
         greatest(0, least(yg + hg, yp + hp) - greatest(yg, yp)) AS ih
  FROM bx
),
i2 AS (
  SELECT insee, iw * ih AS inter,
         wg * hg + wp * hp - iw * ih AS uni
  FROM m
)
SELECT insee, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(CASE WHEN 2 * inter >= uni THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(SUM(inter * 1000 // uni) AS BIGINT) AS sum_iou_milli
FROM i2 GROUP BY 1 ORDER BY insee"""


def q_track_frechet() -> str:
    """Discrete Fréchet (stages/tracks.frechet_pairs): same stride sample
    and adjacent-pair set as q_track_hausdorff; the DP row advances via
    list_reduce — acc starts at the [f1] boundary cell and each step
    appends max(d_j, min(prev_j, prev_{j-1}, acc_last)); all values are
    exact BIGINT squared distances, sqrt-rounded once at the end."""
    from .stages.tracks import HAUSDORFF_STRIDE

    return f"""WITH RECURSIVE {base_pts_cte()},
{_TRACK_XY},
rn AS (
  SELECT insee, sidx, doc_id, ix, iy,
         row_number() OVER (PARTITION BY insee, sidx ORDER BY doc_id) - 1
           AS rn
  FROM xy
),
samp AS (SELECT insee, sidx, doc_id, ix, iy FROM rn
         WHERE rn % {HAUSDORFF_STRIDE} = 0),
srn AS (
  SELECT insee, sidx, ix, iy,
         row_number() OVER (PARTITION BY insee, sidx ORDER BY doc_id) AS q
  FROM samp
),
streets AS (SELECT DISTINCT insee, sidx FROM samp),
pairs AS (
  SELECT insee, sidx AS sidx_a,
         LEAD(sidx) OVER (PARTITION BY insee ORDER BY sidx) AS sidx_b
  FROM streets
),
p2 AS (SELECT * FROM pairs WHERE sidx_b IS NOT NULL),
dmat AS (
  SELECT p.insee, p.sidx_a, p.sidx_b, a.q AS i, b.q AS j,
         (a.ix - b.ix) * (a.ix - b.ix)
           + (a.iy - b.iy) * (a.iy - b.iy) AS d2
  FROM p2 p
  JOIN srn a ON a.insee = p.insee AND a.sidx = p.sidx_a
  JOIN srn b ON b.insee = p.insee AND b.sidx = p.sidx_b
),
dl AS (
  SELECT insee, sidx_a, sidx_b, i, list(d2 ORDER BY j) AS dv
  FROM dmat GROUP BY 1, 2, 3, 4
),
rec AS (
  SELECT insee, sidx_a, sidx_b, i,
         list_reduce(
           list_prepend([dv[1]],
             list_transform(range(2, len(dv) + 1), j -> [dv[j]])),
           (acc, x) -> list_append(acc, greatest(x[1], acc[len(acc)])))
           AS costs
  FROM dl WHERE i = 1
  UNION ALL
  SELECT e.insee, e.sidx_a, e.sidx_b, e.i,
         list_reduce(
           list_prepend([greatest(e.dv[1], r.costs[1])],
             list_transform(range(2, len(e.dv) + 1),
               j -> [e.dv[j], r.costs[j], r.costs[j - 1]])),
           (acc, x) -> list_append(acc,
               greatest(x[1], least(x[2], x[3], acc[len(acc)]))))
  FROM rec r JOIN dl e
    ON e.insee = r.insee AND e.sidx_a = r.sidx_a
   AND e.sidx_b = r.sidx_b AND e.i = r.i + 1
),
fin AS (
  SELECT insee, sidx_a, sidx_b, MAX(i) AS m_pts FROM rec GROUP BY 1, 2, 3
)
SELECT f.insee, f.sidx_a, f.sidx_b, CAST(f.m_pts AS BIGINT) AS m_pts,
       CAST(len(r.costs) AS BIGINT) AS n_pts,
       CAST(floor(sqrt(CAST(r.costs[len(r.costs)] AS DOUBLE)) + 0.5)
         AS BIGINT) AS frechet_u
FROM fin f JOIN rec r
  ON r.insee = f.insee AND r.sidx_a = f.sidx_a AND r.sidx_b = f.sidx_b
 AND r.i = f.m_pts
ORDER BY f.insee, f.sidx_a"""


def q_track_lcss() -> str:
    """LCSS (stages/tracks.lcss_pairs): the q_track_frechet recursion
    with the tolerant-match recurrence in the SAME running-max form the
    engine evaluates — f_j = greatest(acc_last, CASE match THEN
    prev_{j-1}+1 ELSE prev_j END); match carried as a per-cell 1/0."""
    from .stages.tracks import LCSS_EPS_U, LCSS_STRIDE

    return f"""WITH RECURSIVE {base_pts_cte()},
{_TRACK_XY},
rn AS (
  SELECT insee, sidx, doc_id, ix, iy,
         row_number() OVER (PARTITION BY insee, sidx ORDER BY doc_id) - 1
           AS rn
  FROM xy
),
samp AS (SELECT insee, sidx, doc_id, ix, iy FROM rn
         WHERE rn % {LCSS_STRIDE} = 0),
srn AS (
  SELECT insee, sidx, ix, iy,
         row_number() OVER (PARTITION BY insee, sidx ORDER BY doc_id) AS q
  FROM samp
),
streets AS (SELECT DISTINCT insee, sidx FROM samp),
pairs AS (
  SELECT insee, sidx AS sidx_a,
         LEAD(sidx) OVER (PARTITION BY insee ORDER BY sidx) AS sidx_b
  FROM streets
),
p2 AS (SELECT * FROM pairs WHERE sidx_b IS NOT NULL),
dmat AS (
  SELECT p.insee, p.sidx_a, p.sidx_b, a.q AS i, b.q AS j,
         CASE WHEN abs(a.ix - b.ix) <= {LCSS_EPS_U}
               AND abs(a.iy - b.iy) <= {LCSS_EPS_U}
              THEN 1 ELSE 0 END AS mt
  FROM p2 p
  JOIN srn a ON a.insee = p.insee AND a.sidx = p.sidx_a
  JOIN srn b ON b.insee = p.insee AND b.sidx = p.sidx_b
),
dl AS (
  SELECT insee, sidx_a, sidx_b, i, list(mt ORDER BY j) AS mv
  FROM dmat GROUP BY 1, 2, 3, 4
),
rec AS (
  SELECT insee, sidx_a, sidx_b, i,
         list_reduce(
           list_prepend([mv[1]],
             list_transform(range(2, len(mv) + 1), j -> [mv[j]])),
           (acc, x) -> list_append(acc,
               greatest(acc[len(acc)], x[1]))) AS costs
  FROM dl WHERE i = 1
  UNION ALL
  SELECT e.insee, e.sidx_a, e.sidx_b, e.i,
         list_reduce(
           list_prepend(
             [CASE WHEN e.mv[1] = 1 THEN 1 ELSE r.costs[1] END],
             list_transform(range(2, len(e.mv) + 1),
               j -> [e.mv[j], r.costs[j], r.costs[j - 1]])),
           (acc, x) -> list_append(acc,
               greatest(acc[len(acc)],
                        CASE WHEN x[1] = 1 THEN x[3] + 1 ELSE x[2] END)))
  FROM rec r JOIN dl e
    ON e.insee = r.insee AND e.sidx_a = r.sidx_a
   AND e.sidx_b = r.sidx_b AND e.i = r.i + 1
),
fin AS (
  SELECT insee, sidx_a, sidx_b, MAX(i) AS m_pts FROM rec GROUP BY 1, 2, 3
)
SELECT f.insee, f.sidx_a, f.sidx_b, CAST(f.m_pts AS BIGINT) AS m_pts,
       CAST(len(r.costs) AS BIGINT) AS n_pts,
       CAST(r.costs[len(r.costs)] AS BIGINT) AS lcss_len
FROM fin f JOIN rec r
  ON r.insee = f.insee AND r.sidx_a = f.sidx_a AND r.sidx_b = f.sidx_b
 AND r.i = f.m_pts
ORDER BY f.insee, f.sidx_a"""


def q_track_dtw() -> str:
    """DTW (stages/tracks.dtw_pairs): the q_track_frechet recursion with
    min-plus steps — base row is a running SUM, step appends
    d_j + least(prev_j, prev_{j-1}, acc_last); exact BIGINT."""
    from .stages.tracks import HAUSDORFF_STRIDE

    return f"""WITH RECURSIVE {base_pts_cte()},
{_TRACK_XY},
rn AS (
  SELECT insee, sidx, doc_id, ix, iy,
         row_number() OVER (PARTITION BY insee, sidx ORDER BY doc_id) - 1
           AS rn
  FROM xy
),
samp AS (SELECT insee, sidx, doc_id, ix, iy FROM rn
         WHERE rn % {HAUSDORFF_STRIDE} = 0),
srn AS (
  SELECT insee, sidx, ix, iy,
         row_number() OVER (PARTITION BY insee, sidx ORDER BY doc_id) AS q
  FROM samp
),
streets AS (SELECT DISTINCT insee, sidx FROM samp),
pairs AS (
  SELECT insee, sidx AS sidx_a,
         LEAD(sidx) OVER (PARTITION BY insee ORDER BY sidx) AS sidx_b
  FROM streets
),
p2 AS (SELECT * FROM pairs WHERE sidx_b IS NOT NULL),
dmat AS (
  SELECT p.insee, p.sidx_a, p.sidx_b, a.q AS i, b.q AS j,
         (a.ix - b.ix) * (a.ix - b.ix)
           + (a.iy - b.iy) * (a.iy - b.iy) AS d2
  FROM p2 p
  JOIN srn a ON a.insee = p.insee AND a.sidx = p.sidx_a
  JOIN srn b ON b.insee = p.insee AND b.sidx = p.sidx_b
),
dl AS (
  SELECT insee, sidx_a, sidx_b, i, list(d2 ORDER BY j) AS dv
  FROM dmat GROUP BY 1, 2, 3, 4
),
rec AS (
  SELECT insee, sidx_a, sidx_b, i,
         list_reduce(
           list_prepend([dv[1]],
             list_transform(range(2, len(dv) + 1), j -> [dv[j]])),
           (acc, x) -> list_append(acc, x[1] + acc[len(acc)])) AS costs
  FROM dl WHERE i = 1
  UNION ALL
  SELECT e.insee, e.sidx_a, e.sidx_b, e.i,
         list_reduce(
           list_prepend([e.dv[1] + r.costs[1]],
             list_transform(range(2, len(e.dv) + 1),
               j -> [e.dv[j], r.costs[j], r.costs[j - 1]])),
           (acc, x) -> list_append(acc,
               x[1] + least(x[2], x[3], acc[len(acc)])))
  FROM rec r JOIN dl e
    ON e.insee = r.insee AND e.sidx_a = r.sidx_a
   AND e.sidx_b = r.sidx_b AND e.i = r.i + 1
),
fin AS (
  SELECT insee, sidx_a, sidx_b, MAX(i) AS m_pts FROM rec GROUP BY 1, 2, 3
)
SELECT f.insee, f.sidx_a, f.sidx_b, CAST(f.m_pts AS BIGINT) AS m_pts,
       CAST(len(r.costs) AS BIGINT) AS n_pts,
       CAST(r.costs[len(r.costs)] AS BIGINT) AS dtw_cost
FROM fin f JOIN rec r
  ON r.insee = f.insee AND r.sidx_a = f.sidx_a AND r.sidx_b = f.sidx_b
 AND r.i = f.m_pts
ORDER BY f.insee, f.sidx_a"""


def q_minhash_est_err() -> str:
    """Sketch-quality census (stages/dedup.minhash_est_err): reuses the
    q_minhash_pairs CTE prefix (shingles → md5 → signatures → banded
    candidates with the 200-doc skew guard) and finishes with the
    signature component-match count and the exact integer Jaccard
    num/den over distinct shingle-hash sets — no threshold cut."""
    base = q_minhash_pairs()
    head = base.split("mh_j AS")[0]
    return head + """mh_sm AS (
  SELECT c.a, c.b, CAST(COUNT(*) FILTER (x.s = y.s) AS BIGINT) AS sig_match
  FROM mh_cand c
  JOIN mh_sig x ON x.doc_id = c.a
  JOIN mh_sig y ON y.doc_id = c.b AND y.p = x.p
  GROUP BY 1, 2
)
SELECT c.a AS doc_a, c.b AS doc_b, m.sig_match,
       CAST(COALESCE(i.i, 0) AS BIGINT) AS jac_num,
       CAST(na.n + nb.n - COALESCE(i.i, 0) AS BIGINT) AS jac_den
FROM mh_cand c
JOIN mh_sm m ON m.a = c.a AND m.b = c.b
JOIN mh_cnt na ON na.doc_id = c.a
JOIN mh_cnt nb ON nb.doc_id = c.b
LEFT JOIN mh_inter i ON i.a = c.a AND i.b = c.b
ORDER BY doc_a, doc_b"""


def q_mmr_rerank() -> str:
    """MMR re-rank (queries.q_mmr_rerank): the q_bm25 top-20 as a ranked
    candidate CTE, exact 3-gram-Jaccard sims over the 190 candidate
    pairs (unrounded IEEE division of exact integer counts), greedy
    argmax via a recursive CTE carrying the selected list."""
    from .pipelines.queries import MMR_LAMBDA as LAM
    from .pipelines.queries import MMR_TOPK as K

    bm25_sql = q_bm25()
    return f"""WITH RECURSIVE cand AS (
  SELECT doc_id, score FROM ({bm25_sql})
),
mm_w AS (
  SELECT d.doc_id, string_split(d.text, ' ') AS w
  FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM cand)
),
mm_sh AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 3
    THEN list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
    ELSE [array_to_string(w, ' ')] END) AS s
  FROM mm_w
),
mm_dh AS (SELECT DISTINCT doc_id, md5_number_lower(s) AS h FROM mm_sh),
mm_cnt AS (SELECT doc_id, COUNT(*) AS n FROM mm_dh GROUP BY 1),
mm_pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM cand x JOIN cand y ON y.doc_id > x.doc_id
),
mm_inter AS (
  SELECT p.a, p.b, COUNT(*) AS i
  FROM mm_pairs p
  JOIN mm_dh x ON x.doc_id = p.a
  JOIN mm_dh y ON y.doc_id = p.b AND y.h = x.h
  GROUP BY 1, 2
),
sims AS (
  SELECT p.a, p.b,
         CAST(COALESCE(i.i, 0) AS DOUBLE)
           / (na.n + nb.n - COALESCE(i.i, 0)) AS sim
  FROM mm_pairs p
  JOIN mm_cnt na ON na.doc_id = p.a
  JOIN mm_cnt nb ON nb.doc_id = p.b
  LEFT JOIN mm_inter i ON i.a = p.a AND i.b = p.b
),
mmr AS (
  SELECT 0 AS step, CAST([] AS BIGINT[]) AS sel
  UNION ALL
  SELECT step + 1,
         list_append(sel, (
           SELECT t.doc_id FROM cand t
           WHERE NOT list_contains(m.sel, t.doc_id)
           ORDER BY {LAM} * t.score - (1 - {LAM}) * COALESCE((
               SELECT MAX(s.sim) FROM sims s
               WHERE (s.a = t.doc_id AND list_contains(m.sel, s.b))
                  OR (s.b = t.doc_id AND list_contains(m.sel, s.a))), 0.0)
             DESC, t.doc_id
           LIMIT 1))
  FROM mmr m WHERE step < {K}
),
fin AS (SELECT sel FROM mmr WHERE step = {K})
SELECT CAST(i + 1 AS BIGINT) AS rank, sel[i + 1] AS doc_id
FROM fin, UNNEST(range(len(sel))) t(i)
ORDER BY 1"""


def q_containment_pairs() -> str:
    """Containment census (stages/dedup.containment_pairs): the
    q_minhash_pairs candidate CTE prefix + per-side distinct-shingle
    counts and both directional containments."""
    base = q_minhash_pairs()
    head = base.split("mh_j AS")[0]
    return head + """mh_c AS (
  SELECT c.a AS doc_a, c.b AS doc_b,
         CAST(COALESCE(i.i, 0) AS BIGINT) AS n_inter,
         CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b
  FROM mh_cand c
  JOIN mh_cnt na ON na.doc_id = c.a
  JOIN mh_cnt nb ON nb.doc_id = c.b
  LEFT JOIN mh_inter i ON i.a = c.a AND i.b = c.b
)
SELECT doc_a, doc_b, n_inter, n_a, n_b,
       round(CAST(n_inter AS DOUBLE) / greatest(n_a, 1), 6) AS cont_ab,
       round(CAST(n_inter AS DOUBLE) / greatest(n_b, 1), 6) AS cont_ba
FROM mh_c ORDER BY doc_a, doc_b"""


def q_embed_drift() -> str:
    """Lag-similarity census (stages/ann.embed_drift): LAG over the
    per-label vec_id stream, cosine via list_inner_product on DOUBLE
    lists, round-6."""
    return """WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, vec_id,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
lagd AS (
  SELECT label, vec_id,
         LAG(vec_id) OVER w AS vec_prev, LAG(v) OVER w AS pv, v
  FROM e WINDOW w AS (PARTITION BY label ORDER BY vec_id)
),
c AS (
  SELECT label, vec_prev, vec_id,
         round(list_inner_product(v, pv)
               / (sqrt(list_inner_product(v, v))
                  * sqrt(list_inner_product(pv, pv))), 6) AS cos
  FROM lagd WHERE vec_prev IS NOT NULL
)
SELECT label, vec_prev, vec_id, cos, cos < 0.0 AS drift
FROM c ORDER BY label, vec_id"""


def q_image_pool() -> str:
    """Grid-pooled luminance (pipelines/flagship.ImagePool): the
    _pixel_u8_cte pixel replay, per-pixel channel-sum luminance, block
    index coord·G // extent — all-integer aggregate."""
    from .pipelines.flagship import POOL_G

    g = POOL_G
    return f"""WITH {_pixel_u8_cte()},
lum AS (
  SELECT doc_id, w, h, pix, CAST(SUM(val) AS BIGINT) AS lum
  FROM u8 GROUP BY 1, 2, 3, 4
),
blk AS (
  SELECT doc_id, ((pix % w) * {g}) // w AS gx,
         ((pix // w) * {g}) // h AS gy, lum
  FROM lum
)
SELECT doc_id, CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(lum) AS BIGINT) AS sum_lum
FROM blk GROUP BY 1, 2, 3 ORDER BY doc_id, gy, gx"""
