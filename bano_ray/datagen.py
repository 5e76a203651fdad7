"""Deterministic synthesis of the graft input table.

BASELINE.json ``input_hint`` fixes the input shape: a Lance/Arrow table of
image + caption rows ``(image_id, bytes, w, h, fmt, caption, phash)`` plus
synthesized ``lon/lat``.  No such table exists in ``/root/testdata``, so it
is DERIVED — deterministically and SQL-replicably — from the driver's
``documents.parquet`` (one image per ``doc_id``).

Every derived column is a pure integer-arithmetic function of ``doc_id``
(multiplicative-hash streams + modulo indexing into fixed template lists),
written so the exact same values are reproducible in DuckDB SQL — that is
what gives the driver's correctness gate real oracles for the spatial
pipeline.  ``bano_ray.oracle`` renders the matching SQL from the
same constants (single source of truth).

Scale note: generation is a stateless ``map_batches`` over a column-pruned
read of ``documents.parquet`` (only ``doc_id`` leaves storage); at 100 TB
the same stage form ingests a real Lance table instead.

Caption grammar: ``"<housenumber>, <street spelling>"`` or just
``"<street spelling>"`` — the housenumber rides inside the caption (the
input schema has no housenumber column) and is recovered by the caption
parser stage, mirroring how the reference carries numero+voie per address
point (``bano/models.py:10-19``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import encode_image

# ---------------------------------------------------------------------------
# Derivation constants — mirrored into SQL by bano_ray.oracle
# ---------------------------------------------------------------------------

MULT = 2654435761       # Knuth multiplicative hash
MOD = 2147483647        # 2^31 - 1
STREAM_STEP = 1000003

LON0, LON_SPAN, NZX = -5.0, 14.0, 8
LAT0, LAT_SPAN, NZY = 41.0, 10.0, 7
NZONES = NZX * NZY

URBAN_MOD = 20          # doc_id % 20 == 0 → dense urban cluster (skew test)
URBAN_LON0, URBAN_LAT0, URBAN_SPAN = 2.2, 48.7, 0.2

SOURCES = ["OSM", "BAN", "BAL", "CADASTRE"]

# Street spelling groups: 4 per-source spellings that normalize() to the SAME
# merge key — cross-source collisions only materialize after normalization
# (reference behavior: same street spelled differently per source).
# Verified by tests/test_datagen.py against bano_ray.functions.normalize.
STREET_SPELLINGS: list[list[str]] = [
    ["Boulevard de Sébastopol", "BD SEBASTOPOL", "boulevard de Sebastopol", "BOULEVARD DE SEBASTOPOL"],
    ["Rue des Lilas", "RUE DES LILAS", "rue des lilas", "Rue des lilas"],
    ["Avenue du Général Leclerc", "AVENUE DU GENERAL LECLERC", "Avenue du Gal Leclerc", "avenue du général leclerc"],
    ["Place Charles de Gaulle", "PLACE CHARLES DE GAULLE", "place Charles-de-Gaulle", "Place Charles de Gaul"],
    ["Chemin du Pré Haut", "CHEMIN DU PRE HAUT", "chemin du Pré-Haut", "Chemin du Pre Haut"],
    ["Rue de l'Église", "RUE DE L'EGLISE", "rue de l’Église", "Rue de l Eglise"],
    ["Impasse des Acacias", "IMPASSE DES ACACIAS", "impasse des acacias", "Impasse des Acacias "],
    ["Route de Nancy", "RTE DE NANCY", "route de Nancy", "ROUTE DE NANCY"],
    ["Rue du 8 Mai 1945", "RUE DU 8 MAI 1945", "rue du 8 mai 1945", "Rue du 8-Mai-1945"],
    ["Rue Jean-Baptiste Clément", "RUE JEAN-BAPTISTE CLEMENT", "rue Jean Baptiste Clément", "Rue Jean-Baptiste Clement"],
    ["Quai François Mitterrand", "QUAI FRANCOIS MITTERRAND", "quai François-Mitterrand", "Quai Francois Mitterrand"],
    ["Allée des Tilleuls", "ALLEE DES TILLEULS", "allée des Tilleuls", "Allee des Tilleuls"],
    ["Rue Victor Hugo", "RUE VICTOR HUGO", "rue victor hugo", "Rue Victor-Hugo"],
    ["Avenue Jean Jaurès", "AVENUE JEAN JAURES", "avenue Jean-Jaurès", "Avenue Jean Jaures"],
    ["Rue de Verdun", "RUE DE VERDUN", "rue de Verdun", "Rue de Verdun "],
    ["Rue du Docteur Schweitzer", "RUE DU DOCTEUR SCHWEITZER", "rue du Dr Schweitzer", "Rue du Docteur Schweitzer "],
    ["Boulevard Henri IV", "BOULEVARD HENRI IV", "boulevard Henri IV", "Boulevard Henri IV "],
    ["Rue du Moulin", "RUE DU MOULIN", "rue du moulin", "Rue du Moulin "],
    ["Place du Marché", "PLACE DU MARCHE", "place du Marché", "Place du Marche"],
    ["Rue des Écoles", "RUE DES ECOLES", "rue des écoles", "Rue des Ecoles"],
    ["Chemin de la Fontaine", "CHEMIN DE LA FONTAINE", "chemin de la Fontaine", "Chemin de la Fontaine "],
    ["Rue Saint-Jean", "RUE SAINT-JEAN", "rue Saint Jean", "Rue St Jean"],
    ["Avenue de la Gare", "AVENUE DE LA GARE", "avenue de la gare", "Avenue de la Gare "],
    ["Rue du Maréchal Juin", "RUE DU MARECHAL JUIN", "rue du Mal Juin", "Rue du Marechal Juin"],
    ["Esplanade de la Défense", "ESPLANADE DE LA DEFENSE", "esplanade de la Défense", "Esplanade de la Defense"],
    ["Rue des Trois Fontaines", "RUE DES TROIS FONTAINES", "rue des 3 Fontaines", "Rue des Trois Fontaines "],
    ["Sentier des Vignes", "SENTIER DES VIGNES", "sentier des vignes", "Sentier des Vignes "],
    ["Rue de Bellevue", "RUE DE BELLEVUE", "rue de Bellevue", "Rue de Bellevue "],
    ["Passage du Commerce", "PASSAGE DU COMMERCE", "passage du Commerce", "Passage du Commerce "],
    ["Rue du Président Wilson", "RUE DU PRESIDENT WILSON", "rue du Pdt Wilson", "Rue du President Wilson"],
    ["Rue de la Croix Blanche", "RUE DE LA CROIX BLANCHE", "rue de la Croix-Blanche", "Rue de la Croix Blanche "],
    ["Montée du Château", "MONTEE DU CHATEAU", "montée du Château", "Montee du Chateau"],
    ["Rue du Petit Bois", "RUE DU PETIT BOIS", "rue du Petit-Bois", "Rue du Petit Bois "],
    ["Rue des Frères Lumière", "RUE DES FRERES LUMIERE", "rue des Frères-Lumière", "Rue des Freres Lumiere"],
    ["Avenue du 11 Novembre", "AVENUE DU 11 NOVEMBRE", "avenue du 11-Novembre", "Avenue du 11 Novembre "],
    ["Rue de la Paix", "RUE DE LA PAIX", "rue de la paix", "Rue de la Paix "],
    ["Square des Peupliers", "SQUARE DES PEUPLIERS", "square des Peupliers", "Square des Peupliers "],
    ["Rue du Stade", "RUE DU STADE", "rue du stade", "Rue du Stade "],
    ["Venelle des Remparts", "VENELLE DES REMPARTS", "venelle des Remparts", "Venelle des Remparts "],
    ["Rue des Jardins", "RUE DES JARDINS", "rue des jardins", "Rue des Jardins "],
    # ---- streets BELOW this line are NOT in the registry (K_REG = 40) ----
    ["Chemin des Oiseaux Perdus", "CHEMIN DES OISEAUX PERDUS", "chemin des Oiseaux Perdus", "Chemin des Oiseaux Perdus "],
    ["Rue de la Ferme Neuve", "RUE DE LA FERME NEUVE", "rue de la Ferme-Neuve", "Rue de la Ferme Neuve "],
    ["Allée du Vieux Lavoir", "ALLEE DU VIEUX LAVOIR", "allée du Vieux-Lavoir", "Allee du Vieux Lavoir"],
    ["Impasse du Four Banal", "IMPASSE DU FOUR BANAL", "impasse du Four-Banal", "Impasse du Four Banal "],
    ["Rue des Remparts Sud", "RUE DES REMPARTS SUD", "rue des Remparts-Sud", "Rue des Remparts Sud "],
    ["Sentier du Bord de l'Eau", "SENTIER DU BORD DE L'EAU", "sentier du Bord de l’Eau", "Sentier du Bord de l Eau"],
    ["Rue Basse du Vallon", "RUE BASSE DU VALLON", "rue basse du Vallon", "Rue Basse du Vallon "],
    ["Chemin Creux des Landes", "CHEMIN CREUX DES LANDES", "chemin creux des Landes", "Chemin Creux des Landes "],
]
NSTREET = len(STREET_SPELLINGS)   # 48
K_REG = 40                        # streets 0..39 exist in the registry

# --- hamlet (suffix-zone) street population -------------------------------
# Models the real-world situation the reference's suffix machinery exists
# for (bano/pre_process_suffixe.py): BAN/BAL/CADASTRE names carry a hamlet
# tail ("... Kervella"), the OSM name lacks it, and geometric suffix-zone
# decoration re-unifies the merge keys.  Spelling groups are
# [OSM(no tail), BAN, BAL, CADASTRE] — the last three normalize to the SAME
# key; normalize(OSM) + ' ' + TAIL == that key (tests/test_datagen.py).
# Family A (groups 0..7) shares the one-word tail KERVELLA (4-word keys);
# family B (groups 8..15) shares the two-word tail BAS BOURG (5-word keys),
# exercising the two-word-beats-components selection rule.
HAMLET_SPELLINGS: list[list[str]] = [
    ["Chemin des Quatre Vents", "CHEMIN DES QUATRE VENTS KERVELLA", "chemin des quatre vents Kervella", "Chemin des Quatre Vents Kervella "],
    ["Impasse du Vieux Moulin", "IMPASSE DU VIEUX MOULIN KERVELLA", "impasse du vieux moulin Kervella", "Impasse du Vieux Moulin Kervella "],
    ["Rue de la Petite Fontaine", "RUE DE LA PETITE FONTAINE KERVELLA", "rue de la petite fontaine Kervella", "Rue de la Petite Fontaine Kervella "],
    ["Allée des Hauts Jardins", "ALLEE DES HAUTS JARDINS KERVELLA", "allée des hauts jardins Kervella", "Allee des Hauts Jardins Kervella "],
    ["Route du Petit Port", "ROUTE DU PETIT PORT KERVELLA", "route du petit port Kervella", "Route du Petit Port Kervella "],
    ["Rue des Longs Champs", "RUE DES LONGS CHAMPS KERVELLA", "rue des longs champs Kervella", "Rue des Longs Champs Kervella "],
    ["Chemin du Haut Bosquet", "CHEMIN DU HAUT BOSQUET KERVELLA", "chemin du haut bosquet Kervella", "Chemin du Haut Bosquet Kervella "],
    ["Impasse des Trois Chênes", "IMPASSE DES TROIS CHENES KERVELLA", "impasse des trois chênes Kervella", "Impasse des Trois Chenes Kervella "],
    ["Rue du Clos Vert", "RUE DU CLOS VERT BAS BOURG", "rue du clos vert Bas Bourg", "Rue du Clos Vert Bas Bourg "],
    ["Chemin des Roches Grises", "CHEMIN DES ROCHES GRISES BAS BOURG", "chemin des roches grises Bas Bourg", "Chemin des Roches Grises Bas Bourg "],
    ["Impasse du Puits Salé", "IMPASSE DU PUITS SALE BAS BOURG", "impasse du puits salé Bas Bourg", "Impasse du Puits Sale Bas Bourg "],
    ["Route du Vieux Chêne", "ROUTE DU VIEUX CHENE BAS BOURG", "route du vieux chêne Bas Bourg", "Route du Vieux Chene Bas Bourg "],
    ["Allée des Quatre Saisons", "ALLEE DES QUATRE SAISONS BAS BOURG", "allée des quatre saisons Bas Bourg", "Allee des Quatre Saisons Bas Bourg "],
    ["Rue de la Grande Lande", "RUE DE LA GRANDE LANDE BAS BOURG", "rue de la grande lande Bas Bourg", "Rue de la Grande Lande Bas Bourg "],
    ["Chemin du Petit Val", "CHEMIN DU PETIT VAL BAS BOURG", "chemin du petit val Bas Bourg", "Chemin du Petit Val Bas Bourg "],
    ["Rue des Blés Dorés", "RUE DES BLES DORES BAS BOURG", "rue des blés dorés Bas Bourg", "Rue des Bles Dores Bas Bourg "],
]
NHAMLET = len(HAMLET_SPELLINGS)   # 16
NSTREET_ALL = NSTREET + NHAMLET   # 64; hamlet streets are sidx 48..63
HAMLET_TAILS = ["KERVELLA", "BAS BOURG"]  # family A / family B suffixes
HAMLET_MOD = 7                    # doc_id % 7 == 3 (and not urban) → hamlet
HAMLET_RESIDUE = 3
# family cluster centers (both inside zone 00031); jitter keeps every point
# within 2e-4·√2 ≈ 2.83e-4 deg of any sample center — inside the reference's
# 3e-4-deg suffix-zone buffer (bano/pre_process_suffixe.py:27)
HAM_FAM_LON = (3.0005, 3.0035)
HAM_FAM_LAT = (44.5005, 44.5005)
HAM_JITTER = 0.0001


def is_hamlet(doc_id: np.ndarray) -> np.ndarray:
    d = np.asarray(doc_id, dtype=np.int64)
    return (d % HAMLET_MOD == HAMLET_RESIDUE) & (d % URBAN_MOD != 0)

# housenumber variants — covers multi-value, ranges asc/desc, rep letters,
# junk, oversize, leading zeros (reference fixture cases, FIXTURES.md F4)
HOUSENUMBERS = [
    "12", "7", "1", "3", "25", "142", "8", "21", "2", "17",
    "12 BIS", "4 TER", "9 QUATER", "2B", "7T",
    "2,4,6", "12-18", "18-12", "5;7", "3à9",
    "007", "0012", "99999", "123456789012345", "10 B",
]
NHN = len(HOUSENUMBERS)
HN_EMPTY_MOD = 5        # h4 % 5 == 0 → no housenumber (street-only caption)

FMT_JPEG_MOD = 4        # doc_id % 4 == 0 → lossy 'jpeg' (stub codec), else png
PHASH_DUP_MOD = 11      # doc_id % 11 ∈ {0,1} → planted exact-dup pair
PHASH_MULT = 1000003
PHASH_MOD = 281474976710597   # prime < 2^48

FANTOIR_VARIANT_MOD = 5  # 0 valid, 1 '', 2 wrong-zone, 3 9-char BAN id, 4 ''

POSTCODE_EMPTY_MOD = 3


def stream(doc_id: np.ndarray, k: int) -> np.ndarray:
    """k-th deterministic hash stream of doc_id (int64-safe)."""
    d = np.asarray(doc_id, dtype=np.int64)
    return ((d + STREAM_STEP * k) * MULT) % MOD


def lon_lat(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h1 = stream(doc_id, 1)
    h2 = stream(doc_id, 2)
    lon = LON0 + LON_SPAN * ((h1 % 1000000) + 0.5) / 1000000.0
    lat = LAT0 + LAT_SPAN * ((h2 % 1000000) + 0.5) / 1000000.0
    urban = (np.asarray(doc_id, dtype=np.int64) % URBAN_MOD) == 0
    lon = np.where(urban, URBAN_LON0 + URBAN_SPAN * ((h1 % 1000) + 0.5) / 1000.0, lon)
    lat = np.where(urban, URBAN_LAT0 + URBAN_SPAN * ((h2 % 1000) + 0.5) / 1000.0, lat)
    ham = is_hamlet(doc_id)
    fam = ((stream(doc_id, 13) % NHAMLET) >= NHAMLET // 2).astype(np.int64)
    fam_lon = np.asarray(HAM_FAM_LON)[fam]
    fam_lat = np.asarray(HAM_FAM_LAT)[fam]
    jit = 2.0 * HAM_JITTER
    lon = np.where(ham, fam_lon + ((h1 % 1000) + 0.5) / 1000.0 * jit - HAM_JITTER, lon)
    lat = np.where(ham, fam_lat + ((h2 % 1000) + 0.5) / 1000.0 * jit - HAM_JITTER, lat)
    return lon, lat


def zone_of(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Grid-zone index 0..NZONES-1 (oracle zones are axis-aligned boxes; the
    geometric PIP path must agree with this arithmetic on box zones)."""
    zx = np.floor((lon - LON0) / LON_SPAN * NZX).astype(np.int64)
    zy = np.floor((lat - LAT0) / LAT_SPAN * NZY).astype(np.int64)
    zx = np.clip(zx, 0, NZX - 1)
    zy = np.clip(zy, 0, NZY - 1)
    return zx * NZY + zy


def insee_of_zone(zone: np.ndarray) -> np.ndarray:
    return np.char.zfill((np.asarray(zone) + 1).astype("U"), 5)


def street_idx(doc_id: np.ndarray) -> np.ndarray:
    base = stream(doc_id, 3) % NSTREET
    ham = NSTREET + stream(doc_id, 13) % NHAMLET
    return np.where(is_hamlet(doc_id), ham, base)


def source_idx(doc_id: np.ndarray) -> np.ndarray:
    return np.asarray(doc_id, dtype=np.int64) % 4


def housenumber_of(doc_id: np.ndarray) -> np.ndarray:
    h4 = stream(doc_id, 4)
    hn = np.asarray(HOUSENUMBERS, dtype=object)[(h4 % NHN).astype(np.int64)]
    empty = (h4 % HN_EMPTY_MOD) == 0
    return np.where(empty, "", hn)


def caption_of(doc_id: np.ndarray) -> np.ndarray:
    sidx = street_idx(doc_id)
    src = source_idx(doc_id)
    flat = np.asarray([sp for group in STREET_SPELLINGS + HAMLET_SPELLINGS
                       for sp in group], dtype=object)
    street = flat[(sidx * 4 + src).astype(np.int64)]
    hn = housenumber_of(doc_id)
    return np.where(hn == "", street, np.char.add(np.char.add(hn.astype("U"), ", "), street.astype("U")).astype(object))


def phash_of(doc_id: np.ndarray) -> np.ndarray:
    d = np.asarray(doc_id, dtype=np.int64)
    base = np.where(d % PHASH_DUP_MOD < 2, d - (d % PHASH_DUP_MOD), d)
    return (base * PHASH_MULT + 7) % PHASH_MOD


def fmt_of(doc_id: np.ndarray) -> np.ndarray:
    d = np.asarray(doc_id, dtype=np.int64)
    return np.where(d % FMT_JPEG_MOD == 0, "jpeg", "png")


def dims_of(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    w = 12 + (stream(doc_id, 7) % 9)
    h = 12 + (stream(doc_id, 8) % 9)
    return w.astype(np.int32), h.astype(np.int32)


def fantoir_of(doc_id: np.ndarray) -> np.ndarray:
    """Raw FANTOIR-ish id carried by the point, per source (FIXTURES.md F4):

    - OSM rows (tag form): valid fantoir10 / '' / wrong-zone fantoir10
    - BAN rows (``insee_voie`` form, '_' in the rivoli-check slot —
      fantoir9_to_candidate drops position 5 → matches the registry's
      fantoir10[0:9], reference ``bano/core.py:112-116``): valid / '' / wrong
    - BAL and CADASTRE rows carry none (reference table shapes)
    """
    h6 = stream(doc_id, 6)
    src = source_idx(doc_id)
    sidx = street_idx(doc_id)
    lon, lat = lon_lat(doc_id)
    zone = zone_of(lon, lat)
    insee = insee_of_zone(zone)
    wrong = insee_of_zone((zone + 1) % NZONES)
    voie = np.char.zfill(sidx.astype("U"), 4)
    valid10 = np.char.add(np.char.add(insee, voie), "A")
    wrong10 = np.char.add(np.char.add(wrong, voie), "A")
    ban10 = np.char.add(np.char.add(insee, "_"), voie)
    ban10_wrong = np.char.add(np.char.add(wrong, "_"), voie)
    variant = (h6 % 3).astype(np.int64)
    out = np.where(variant == 0, valid10, "")
    out = np.where(variant == 2, wrong10, out)
    out = np.where(src == 1, np.where(variant == 0, ban10,
                                      np.where(variant == 2, ban10_wrong, "")), out)
    out = np.where(src >= 2, "", out)
    return out.astype(object)


PSEUDO_MOD = 6        # CADASTRE rows with h9 % 6 == 0 are pseudo-addresses


def pseudo_of(doc_id: np.ndarray) -> np.ndarray:
    return np.where(stream(doc_id, 9) % PSEUDO_MOD == 0, "true", "false").astype(object)


HIGHWAY_TYPES_GEN = [
    "steps", "path", "cycleway", "footway", "pedestrian", "track", "service",
    "road", "living_street", "residential", "unclassified", "tertiary",
    "secondary", "primary", "trunk", "motorway",
]


def highway_type_of(doc_id: np.ndarray) -> np.ndarray:
    h10 = stream(doc_id, 10)
    return np.asarray(HIGHWAY_TYPES_GEN, dtype=object)[(h10 % 16).astype(np.int64)]


def postcode_of(doc_id: np.ndarray) -> np.ndarray:
    h5 = stream(doc_id, 5)
    lon, lat = lon_lat(doc_id)
    zone = zone_of(lon, lat)
    cp = np.char.zfill(((zone + 1) * 10).astype("U"), 5)
    return np.where(h5 % POSTCODE_EMPTY_MOD == 0, "", cp).astype(object)


PX_STEP = 1000003
PX_SALT = 12345


PX_NOISE = 6  # +/- noise amplitude over the smooth base


def pixels_of_batch(doc_ids: np.ndarray, ws: np.ndarray, hs: np.ndarray) -> list[np.ndarray]:
    """Deterministic photo-like source pixels, fully batch-vectorized.

    Content = per-channel smooth field (base level + bilinear gradient +
    one 2-D cosine) + small hash noise — the statistics a real captioned
    image corpus presents to a codec (uniform noise is the adversarial
    worst case for any transform coder and was never representative).
    One hash-stream evaluation covers the whole batch of ragged images.
    """
    from .runtime import tune_malloc

    tune_malloc()
    d = np.asarray(doc_ids, dtype=np.int64)
    ws = np.asarray(ws, dtype=np.int64)
    hs = np.asarray(hs, dtype=np.int64)
    n = len(d)
    sizes = ws * hs * 3
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offsets[-1])
    # Working-set discipline: the naive form materialized ~30 full-size
    # int64/float64 temporaries (~120 B per pixel-channel) — the cost is
    # not FLOPs but MEMORY: freshly-mapped pages page-fault on first touch
    # and the kernel's zeroing path serializes under concurrent workers
    # (measured: 8000 images take ~5 s/process warm-heap vs ~184 s when 16
    # processes first-fault together).  So: (a) the six per-(doc, channel)
    # hash parameters are computed on the small (n, 3) grid and gathered,
    # (b) everything per-element runs CHUNKED, so the only full-size
    # arrays are the uint8 output and one int64 doc index — chunk
    # temporaries recycle the same retained heap pages (tune_malloc).
    # All arithmetic keeps the exact op order of the original expression —
    # output is bit-identical (test_datagen pixel goldens).
    dch = d[:, None] * 3 + np.arange(3, dtype=np.int64)[None, :]

    def h_of(salt):
        return ((dch * PX_STEP + salt) * MULT) % MOD

    base_g = (64.0 + (h_of(11) % 128).astype(np.float64)).ravel()
    gx_g = ((h_of(12) % 129).astype(np.float64) - 64.0).ravel()
    gy_g = ((h_of(13) % 129).astype(np.float64) - 64.0).ravel()
    amp_g = (16.0 + (h_of(14) % 33).astype(np.float64)).ravel()
    fx_g = (1.0 + (h_of(15) % 2).astype(np.float64)).ravel()
    fy_g = (1.0 + (h_of(16) % 2).astype(np.float64)).ravel()

    doc_idx = np.repeat(np.arange(n, dtype=np.int64), sizes)
    starts = offsets[:-1]
    flat = np.empty(total, dtype=np.uint8)
    CH = 1 << 20
    for s0 in range(0, total, CH):
        s1 = min(total, s0 + CH)
        di = doc_idx[s0:s1]
        k = np.arange(s0, s1, dtype=np.int64)
        k -= starts[di]
        # pixel coordinates + channel from the flat index (row-major h,w,3)
        pix = k // 3
        ch = k - pix * 3
        wrep = ws[di]
        x = (pix % wrep).astype(np.float64)
        x /= np.maximum(wrep - 1, 1)
        y = (pix // wrep).astype(np.float64)
        y /= np.maximum(hs[di] - 1, 1)
        gi = di * 3 + ch
        base = base_g.take(gi)
        gx = gx_g.take(gi)
        gy = gy_g.take(gi)
        amp = amp_g.take(gi)
        fx = fx_g.take(gi)
        fy = fy_g.take(gi)
        noise = d[di]
        noise *= PX_STEP   # the gather made a fresh array — safe in place
        noise += k
        noise += PX_SALT
        noise *= MULT
        noise %= MOD
        noise %= 2 * PX_NOISE + 1
        nf = noise.astype(np.float64)
        nf -= PX_NOISE
        # v = base + gx*x + gy*y + amp*cos(2π(fx*x + fy*y)) + noise, with
        # the same left-to-right association as the naive expression
        arg = fx * x
        arg += fy * y
        arg *= 2.0 * np.pi
        np.cos(arg, out=arg)
        arg *= amp
        v = gx
        v *= x
        v += base
        v += gy * y
        v += arg
        v += nf
        np.round(v, out=v)
        np.clip(v, 0, 255, out=v)
        flat[s0:s1] = v
    return [flat[offsets[i]:offsets[i + 1]].reshape(int(hs[i]), int(ws[i]), 3)
            for i in range(n)]


def pixels_of(doc_id: int, w: int, h: int) -> np.ndarray:
    """Single-image form of :func:`pixels_of_batch` (same content)."""
    return pixels_of_batch(np.array([doc_id]), np.array([w]), np.array([h]))[0]


# ---------------------------------------------------------------------------
# Batch generator (runs inside map_batches)
# ---------------------------------------------------------------------------

class _LookupTables:
    """Precomputed string tables — every string column is a function of a
    small index tuple (zone, sidx, src, hn_idx, variant), so the hot path is
    integer arithmetic + one fancy-index per column instead of per-row
    string building.  Built once per process from the same scalar logic."""

    def __init__(self):
        zones = np.arange(NZONES, dtype=np.int64)
        sidxs = np.arange(NSTREET_ALL, dtype=np.int64)
        self.insee = insee_of_zone(zones).astype(object)          # [zone]
        self.flat = np.asarray([sp for g in STREET_SPELLINGS + HAMLET_SPELLINGS
                                for sp in g], dtype=object)        # [sidx*4+src]
        voie = np.char.zfill(sidxs.astype("U"), 4)
        zz, ss = np.meshgrid(zones, sidxs, indexing="ij")
        ins = self.insee[zz.ravel()].astype("U")
        vv = voie[ss.ravel()]
        self.valid10 = np.char.add(np.char.add(ins, vv), "A").astype(object).reshape(NZONES, NSTREET_ALL)
        self.ban10 = np.char.add(np.char.add(ins, "_"), vv).astype(object).reshape(NZONES, NSTREET_ALL)
        self.cp = np.char.zfill(((zones + 1) * 10).astype("U"), 5).astype(object)  # [zone]
        # caption[(hn_idx+1 if hn else 0), flat_idx]; hn_idx 0 == empty
        caps = np.empty((NHN + 1, NSTREET_ALL * 4), dtype=object)
        caps[0, :] = self.flat
        for hi, hn in enumerate(HOUSENUMBERS):
            caps[hi + 1, :] = np.char.add(hn + ", ", self.flat.astype("U")).astype(object)
        self.caption = caps
        self.sources = np.asarray(SOURCES, dtype=object)
        self.hwt = np.asarray(HIGHWAY_TYPES_GEN, dtype=object)
        self.fmt = np.asarray(["png", "jpeg"], dtype=object)
        self.tf = np.asarray(["false", "true"], dtype=object)
        self.empty = np.asarray([""], dtype=object)
        # Arrow twins: string columns build as C-level takes from these
        # (one code array per column, zero per-row Python objects)
        self.caption_pa = pa.array(caps.ravel(), type=pa.string())
        self.sources_pa = pa.array(SOURCES, type=pa.string())
        self.hwt_pa = pa.array(HIGHWAY_TYPES_GEN, type=pa.string())
        self.fmt_pa = pa.array(["png", "jpeg"], type=pa.string())
        self.tf_pa = pa.array(["false", "true"], type=pa.string())
        # fant dictionary: [valid10 flat | ban10 flat | ""] — code arithmetic
        # in synthesize_batch picks the slice
        self.fant_pa = pa.array(
            np.concatenate([self.valid10.ravel(), self.ban10.ravel(),
                            np.asarray([""], dtype=object)]), type=pa.string())
        self.cp_pa = pa.array(
            np.concatenate([self.cp, np.asarray([""], dtype=object)]),
            type=pa.string())


_TABLES: _LookupTables | None = None


def _tables() -> _LookupTables:
    global _TABLES
    if _TABLES is None:
        _TABLES = _LookupTables()
    return _TABLES


def synthesize_batch(batch: pa.Table, with_bytes: bool = False) -> pa.Table:
    """doc_id batch → image+caption rows.  Pure function of doc_id; all
    string columns come from precomputed low-cardinality lookup tables."""
    import pyarrow.compute as pc

    from .runtime import tune_malloc

    tune_malloc()

    T = _tables()
    doc_id = batch.column("doc_id").to_numpy()
    d = np.asarray(doc_id, dtype=np.int64)
    if "base_id" in batch.column_names:
        # bench-scale expansion is locality-preserving: replicas inherit the
        # base document's location/street/source (real ingest shards are
        # spatially correlated), varying housenumber/payload per replica.
        # The driver-gate path (expand=1) never carries base_id, so the
        # oracle derivations are untouched.
        base = batch.column("base_id").to_numpy()
        lon, lat = lon_lat(base)
        jl = stream(doc_id, 11)
        jt = stream(doc_id, 12)
        lon = lon + ((jl % 2001) - 1000) * 1e-7
        lat = lat + ((jt % 2001) - 1000) * 1e-7
        zone = zone_of(lon, lat)
        sidx = street_idx(base)
        src = source_idx(base)
    else:
        lon, lat = lon_lat(doc_id)
        zone = zone_of(lon, lat)
        sidx = street_idx(doc_id)
        src = source_idx(doc_id)
    h4 = stream(doc_id, 4)
    hn_slot = np.where(h4 % HN_EMPTY_MOD == 0, 0, (h4 % NHN) + 1)
    h6 = stream(doc_id, 6)
    variant = (h6 % 3).astype(np.int64)
    # fantoir: OSM rows get tag-form, BAN rows underscore-form, others none;
    # variant 2 = wrong-zone (same tables indexed by the next zone).
    # All string columns are C-level takes over the precomputed Arrow
    # tables — integer code arithmetic only, no per-row Python strings.
    zone_eff = np.where(variant == 2, (zone + 1) % NZONES, zone)
    nvz = NZONES * NSTREET_ALL
    fant_empty = 2 * nvz
    fant_code = np.where(src == 0, zone_eff * NSTREET_ALL + sidx,
                         np.where(src == 1, nvz + zone_eff * NSTREET_ALL + sidx,
                                  fant_empty))
    fant_code = np.where((variant == 1) | (src >= 2), fant_empty, fant_code)
    fant = pc.take(T.fant_pa, pa.array(fant_code))
    h5 = stream(doc_id, 5)
    postcode = pc.take(T.cp_pa, pa.array(
        np.where(h5 % POSTCODE_EMPTY_MOD == 0, NZONES, zone)))
    w, h = dims_of(doc_id)
    fmt = pc.take(T.fmt_pa, pa.array((d % FMT_JPEG_MOD == 0).astype(np.int64)))
    ids = pc.binary_join_element_wise(
        pa.array(np.repeat("img", len(d))),
        pc.utf8_lpad(pc.cast(pa.array(d), pa.string()), 8, "0"), "")
    cols: dict[str, object] = {
        "doc_id": d,
        "image_id": ids,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": pc.take(T.caption_pa,
                           pa.array(hn_slot * (NSTREET_ALL * 4) + sidx * 4 + src)),
        "phash": phash_of(doc_id).astype(np.int64),
        "lon": lon,
        "lat": lat,
        "source": pc.take(T.sources_pa, pa.array(np.asarray(src, dtype=np.int64))),
        "fantoir_raw": fant,
        "postcode": postcode,
        "pseudo_adresse": pc.take(T.tf_pa, pa.array(
            (stream(doc_id, 9) % PSEUDO_MOD == 0).astype(np.int64))),
        "highway_type": pc.take(T.hwt_pa, pa.array(
            (stream(doc_id, 10) % 16).astype(np.int64))),
    }
    if with_bytes:
        from .codecs import encode_image_batch

        px = pixels_of_batch(d, w, h)
        blobs = encode_image_batch(px, [str(f) for f in fmt])
        cols["bytes"] = pa.array(blobs, type=pa.binary())
    names = ["doc_id", "image_id"] + (["bytes"] if with_bytes else []) + \
        ["w", "h", "fmt", "caption", "phash", "lon", "lat", "source",
         "fantoir_raw", "postcode", "pseudo_adresse", "highway_type"]
    arrays = [cols[n] if isinstance(cols[n], pa.Array) else pa.array(cols[n]) for n in names]
    return pa.table(dict(zip(names, arrays)))


def images_dataset(sf_dir: str, with_bytes: bool = False, expand: int = 1,
                   doc_residue: tuple[int, int] | None = None):
    """Ray Dataset of synthesized image rows for an sf dir.

    Column-pruned read (only doc_id leaves the parquet) → stateless
    map_batches synthesis, zero-copy Arrow batches.

    ``expand`` > 1 derives ``expand`` images per document
    (doc_id' = doc_id * expand + r) — the bench-scale corpus; every
    derivation is a pure function of the expanded id, so pipelines behave
    identically at any scale.

    ``doc_residue=(m, r)`` filters to ``doc_id % m == r`` BEFORE synthesis
    — predicate pushdown for pre-passes that only need one source's rows
    (source is ``doc_id % 4``), skipping the string synthesis for the rest.
    """
    import ray.data

    lance_path = f"{sf_dir}/documents.lance"
    import os as _os
    if _os.path.exists(lance_path):
        # Lance is the production input format (input_hint); the read is the
        # ONLY thing that differs — the pruned doc_id stream feeds the same
        # prefilter/expand/synthesize pipeline below, so expand>1 and
        # doc_residue behave identically for both inputs.
        try:
            ds = ray.data.read_lance(lance_path, columns=["doc_id"])
        except ImportError as exc:
            # No silent fallback: a user pointing the engine at its
            # advertised input format must not unknowingly read a stale
            # parquet sibling.  Fall back ONLY when the parquet twin exists,
            # and say so; otherwise fail with the real cause.
            if _os.path.exists(f"{sf_dir}/documents.parquet"):
                import warnings

                warnings.warn(
                    f"{lance_path} exists but the lance reader is "
                    f"unavailable ({exc}); falling back to "
                    "documents.parquet", RuntimeWarning, stacklevel=2)
            else:
                raise RuntimeError(
                    f"{lance_path} exists but the lance reader is "
                    "unavailable and there is no documents.parquet to fall "
                    "back to — install the 'pylance' package") from exc
        else:
            return _images_pipeline(ds, with_bytes=with_bytes, expand=expand,
                                    doc_residue=doc_residue)
    # size read blocks so each downstream task sees ~150k expanded rows —
    # bigger blocks thrash the string stages, smaller ones drown in task
    # overhead (measured both ways)
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    import ray

    # metadata rows target ~150k rows/block; byte-payload rows are ~1.3 KB
    # each, so the bytes path uses small blocks — (a) oversized per-task
    # outputs (30 MB+) trip the streaming executor's memory budgeting into
    # capping actor concurrency, and (b) a worker's FIRST synthesis call
    # pays the page-fault cost of its peak temporaries, so many small
    # blocks per worker amortize one small cold start instead of paying a
    # big one per task (measured: 6k-row blocks → 30 s cold per task at 32
    # concurrent workers; 1.5k-row blocks cut the peak 4× and give each
    # worker ~8 warm tasks)
    row_target = 1500 if with_bytes else \
        int(_os.environ.get("GRAFT_META_BLOCK_ROWS", "150000"))
    # a doc_residue pre-filter drops (m-1)/m of the rows BEFORE synthesis —
    # size blocks by the rows a task actually processes, not the raw id
    # range, so pre-pass scans get full tasks instead of m× tiny ones
    eff_rows = (n_docs * expand) // (doc_residue[0] if doc_residue else 1)
    by_rows = eff_rows // row_target
    # metadata-row cap is env-tunable (A/B'd at the 1.2B-row scaling
    # corpus: 4096 blocks cut total CPU 4% but cost more packing — 1024
    # stays the default)
    cap = 512 if with_bytes else \
        int(_os.environ.get("GRAFT_META_BLOCK_CAP", "1024"))
    # Block count is DATA-determined (rows/block constant), never
    # cluster-size-determined: the former 8*ncpu bound made an 8-CPU
    # session process 600k-row blocks while a 32-CPU one processed
    # 150k-row blocks of the same corpus — different per-row cost profiles
    # that silently distort any N-vs-4N scaling comparison.  150k rows is
    # the measured sweet spot at high concurrency (300k-row blocks cost
    # 34 s → 55-81 s on the 38.4M-row flagship at 32 CPUs: bigger
    # per-task temporaries thrash the box's page-fault/zeroing bandwidth).
    nblocks = int(min(cap, max(16, by_rows)))
    # Explicit repartition of the tiny id stream instead of
    # override_num_blocks: the documents file is a single fragment, so
    # override made ONE read task stream nblocks splits through its
    # generator buffer at ~16 blocks/s — at 1024 blocks that generator was
    # the whole pipeline's feed bottleneck (the 153.6M-row chain idled at
    # ~16 of 32 cores behind it).  The repartition materializes nblocks
    # independent blocks up front (an all-to-all over just the pruned
    # doc_id column — trivially small) so synthesis tasks launch in
    # parallel immediately.
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"]).repartition(nblocks)
    return _images_pipeline(ds, with_bytes=with_bytes, expand=expand,
                            doc_residue=doc_residue)


def _images_pipeline(ds, with_bytes: bool, expand: int,
                     doc_residue: tuple[int, int] | None):
    """Shared synthesis pipeline over a pruned doc_id stream (parquet or
    lance source — see images_dataset)."""
    if doc_residue is not None and expand == 1:
        m, r = doc_residue

        def prefilter(b: pa.Table) -> pa.Table:
            d = b.column("doc_id").to_numpy()
            return b.filter(pa.array(d % m == r))

        ds = ds.map_batches(prefilter, batch_format="pyarrow", batch_size=None)
    if expand > 1:
        mr = doc_residue

        def blow_up(b: pa.Table) -> pa.Table:
            d = b.column("doc_id").to_numpy()
            if mr is not None:  # source derives from the BASE id in
                d = d[d % mr[0] == mr[1]]  # locality-preserving expansion
            out = (d[:, None] * expand + np.arange(expand)[None, :]).reshape(-1)
            base = np.repeat(d, expand)
            return pa.table({"doc_id": pa.array(out, type=pa.int64()),
                             "base_id": pa.array(base, type=pa.int64())})

        ds = ds.map_batches(blow_up, batch_format="pyarrow", batch_size=None)
    # metadata-only synthesis runs whole-block (micro-batching multiplies
    # per-batch fixed costs ~12x on the combiner stages); byte payloads use
    # bounded batches so batch x concurrency stays in worker heaps (1024 ==
    # ray's default batch size, stated explicitly — the "default" sentinel
    # is deprecated)
    bs = None if not with_bytes else 1024
    return ds.map_batches(lambda b: synthesize_batch(b, with_bytes=with_bytes),
                          batch_format="pyarrow", batch_size=bs)


# ---------------------------------------------------------------------------
# Companion dimension tables (small; built driver-side, broadcast to stages)
# ---------------------------------------------------------------------------

def zone_boxes_wkb() -> list[tuple[str, bytes]]:
    """The grid zones as real WKB polygons — the Ray PIP path runs actual
    geometry against these; the oracle uses the equivalent floor arithmetic."""
    from .geo.wkb import encode_polygon

    out = []
    for zx in range(NZX):
        for zy in range(NZY):
            x0 = LON0 + LON_SPAN * zx / NZX
            x1 = LON0 + LON_SPAN * (zx + 1) / NZX
            y0 = LAT0 + LAT_SPAN * zy / NZY
            y1 = LAT0 + LAT_SPAN * (zy + 1) / NZY
            ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
            insee = str(zx * NZY + zy + 1).zfill(5)
            out.append((insee, encode_polygon([ring])))
    return out


# --- arrondissement world (G9/J12) ------------------------------------------
# Three synthetic metropolises mirror the reference's Paris/Lyon/Marseille
# special-casing: the metro parent's admin_level-8 polygon is EXCLUDED from
# tile-impact lists (reference ``bano/models.py:330-360`` excludes
# '75056','69123','13055') and its METRO_GRID² admin_level-9 arrondissement
# boxes take over, with insee codes built from the same prefixes the
# reference patterns match ('751__', '6938_', '132__').  Zones 34/24/48 are
# chosen because the EXPIRE_TILES fixture hits all three.
METRO_ZONES = {33: "751", 23: "6938", 47: "132"}  # 0-based zone idx → prefix
METRO_GRID = 2


def zone_box(zi: int) -> tuple[float, float, float, float]:
    """(x0, x1, y0, y1) of grid zone ``zi`` (0-based)."""
    zx, zy = zi // NZY, zi % NZY
    return (LON0 + LON_SPAN * zx / NZX, LON0 + LON_SPAN * (zx + 1) / NZX,
            LAT0 + LAT_SPAN * zy / NZY, LAT0 + LAT_SPAN * (zy + 1) / NZY)


def arrondissement_boxes() -> list[tuple[str, str, float, float, float, float]]:
    """admin_level-9 arrondissement boxes: each metro zone's box split into
    METRO_GRID × METRO_GRID, codes = prefix + zero-padded ordinal (75101…,
    69381…, 13201… — 5 chars, disjoint from the '000xx' zone codes).
    Returns (arr_insee, parent_insee, x0, x1, y0, y1)."""
    out = []
    for zi, prefix in sorted(METRO_ZONES.items()):
        x0, x1, y0, y1 = zone_box(zi)
        w = (x1 - x0) / METRO_GRID
        h = (y1 - y0) / METRO_GRID
        parent = str(zi + 1).zfill(5)
        for ax in range(METRO_GRID):
            for ay in range(METRO_GRID):
                a = ax * METRO_GRID + ay + 1
                code = prefix + str(a).zfill(5 - len(prefix))
                out.append((code, parent,
                            x0 + w * ax, x0 + w * (ax + 1),
                            y0 + h * ay, y0 + h * (ay + 1)))
    return out


COMD_EVERY = 9  # every 9th non-metro zone carries one commune déléguée


def cog_communes_table() -> pa.Table:
    """COG commune dim (J12 input, reference ``cog_commune``): a COM row per
    zone (metro parents included — they are what the exclusion removes), ARM
    children under each metro parent, and a COMD row planted on every
    COMD_EVERY-th non-metro zone.  ``dep`` = 2-digit grid column."""
    com, dep, ncc, typecom, comparent = [], [], [], [], []

    def add(c, d, n, t, p):
        com.append(c); dep.append(d); ncc.append(n)
        typecom.append(t); comparent.append(p)

    arrs = arrondissement_boxes()
    for zi in range(NZONES):
        insee = str(zi + 1).zfill(5)
        d = str(zi // NZY + 1).zfill(2)
        add(insee, d, f"ZONE {insee}", "COM", "")
        if zi in METRO_ZONES:
            for code, parent, *_ in arrs:
                if parent == insee:
                    add(code, d, f"ZONE {insee} ARR {code[-2:]}", "ARM", insee)
        elif zi % COMD_EVERY == 0:
            add("9" + str(zi + 1).zfill(4), d,
                f"ZONE {insee} DELEGUEE", "COMD", insee)
    return pa.table({"com": com, "dep": dep, "ncc": ncc,
                     "typecom": typecom, "comparent": comparent})


def registry_table() -> pa.Table:
    """FANTOIR-like registry: streets 0..K_REG-1 in every zone, official name
    = spelling 0, fantoir10 = insee + zfill(sidx,4) + 'A'.  Way-only streets
    (WAYONLY_BASE..) are registered too — they model the reference's
    "rapproché sans adresses" population (J10): matched to the registry via
    the point_par_rue load, but never carrying an address row."""
    from .functions.normalize import normalize_registry_key

    insee, fantoir10, name, key = [], [], [], []
    for z in range(NZONES):
        zi = str(z + 1).zfill(5)
        for s in list(range(K_REG)) + [WAYONLY_BASE + i for i in range(NWAYONLY)]:
            insee.append(zi)
            fantoir10.append(f"{zi}{str(s).zfill(4)}A")
            name.append(street_spelling0(s))
            key.append(normalize_registry_key(street_spelling0(s)))
    return pa.table({"insee": insee, "fantoir10": fantoir10, "name": name,
                     "street_key": key})


# --- G5 street ways (point_par_rue label-point source) ---------------------
# The reference overrides the cumul_voies label point with an on-street
# point computed from the street's OSM way geometry: ways named like the
# street are collected per commune, merged, and the point on the merged
# line closest to its vertex centroid becomes the label
# (bano/sql/point_par_rue_insee_nocache.sql:1-51, applied
# bano/core.py:237-252 + bano/models.py:150-156).  In the synthetic world:
# WAY_SIDX streets (sidx % 8 == 5) carry ways in every zone; WAYONLY
# streets (sidx 64..) exist ONLY as ways + registry rows — the reference's
# point_par_rue registration path and the J10 voies-sans-adresses
# population (no document ever maps to them).
WAYONLY_SPELLINGS: list[list[str]] = [
    ["Traverse des Vignes Hautes"],
    ["Passage du Grand Canal"],
]
NWAYONLY = len(WAYONLY_SPELLINGS)   # 2
WAYONLY_BASE = NSTREET_ALL          # 64; way-only streets are sidx 64..65
WAY_SIDX = [s for s in range(NSTREET) if s % 8 == 5] \
    + [WAYONLY_BASE + i for i in range(NWAYONLY)]


def street_spelling0(sidx: int) -> str:
    """Canonical (OSM/official) spelling for any street index, including
    hamlet and way-only streets."""
    if sidx >= WAYONLY_BASE:
        return WAYONLY_SPELLINGS[sidx - WAYONLY_BASE][0]
    if sidx >= NSTREET:
        return HAMLET_SPELLINGS[sidx - NSTREET][0]
    return STREET_SPELLINGS[sidx][0]


def way_fragments(zone: int, sidx: int) -> list[np.ndarray]:
    """The street's way as two L-shaped fragments sharing a vertex (so the
    label computation exercises multi-fragment collect + snap).  Family V
    (even sidx) has the long tail vertical, family H horizontal — the
    vertex centroid is off both segments and the snap lands on the tail,
    exercising both projection branches.  All vertices stay inside the
    zone box so point-in-polygon assigns the constructing zone."""
    zx, zy = zone // NZY, zone % NZY
    w = LON_SPAN / NZX
    h = LAT_SPAN / NZY
    x0 = LON0 + w * (zx + 0.15 + 0.015 * (sidx % 13))
    y0 = LAT0 + h * (zy + 0.15 + 0.011 * (sidx % 17))
    d = w * 0.01
    if sidx % 2 == 0:
        p0, p1, p2 = (x0, y0), (x0 + d, y0), (x0 + d, y0 + 2 * d)
    else:
        p0, p1, p2 = (x0, y0), (x0, y0 + d), (x0 + 2 * d, y0 + d)
    return [np.array([p0, p1], dtype=np.float64),
            np.array([p1, p2], dtype=np.float64)]


def street_ways_dataset(sf_dir: str | None = None):
    """Way-fragment rows as a Ray Dataset — the input to the distributed
    street-label pre-pass (stages/label.py).  Dim-sized here (zones ×
    WAY_SIDX × 2 fragments); a real deployment reads way geometries from
    the OSM import instead, same schema."""
    import ray.data

    rows: dict[str, list] = {k: [] for k in
                             ("way_id", "frag_idx", "name", "ax", "ay", "bx", "by")}
    for z in range(NZONES):
        for s in WAY_SIDX:
            for fi, fr in enumerate(way_fragments(z, s)):
                rows["way_id"].append(z * 1000 + s)
                rows["frag_idx"].append(fi)
                rows["name"].append(street_spelling0(s))
                rows["ax"].append(float(fr[0, 0]))
                rows["ay"].append(float(fr[0, 1]))
                rows["bx"].append(float(fr[1, 0]))
                rows["by"].append(float(fr[1, 1]))
    return ray.data.from_arrow(pa.table({
        "way_id": pa.array(rows["way_id"], type=pa.int64()),
        "frag_idx": pa.array(rows["frag_idx"], type=pa.int64()),
        "name": pa.array(rows["name"], type=pa.string()),
        "ax": pa.array(rows["ax"], type=pa.float64()),
        "ay": pa.array(rows["ay"], type=pa.float64()),
        "bx": pa.array(rows["bx"], type=pa.float64()),
        "by": pa.array(rows["by"], type=pa.float64()),
    }))


def zone_dims_table() -> pa.Table:
    """COG/infos_communes-like enrichment per zone (population, adm_weight)."""
    zone = np.arange(NZONES, dtype=np.int64)
    insee = insee_of_zone(zone)
    return pa.table({
        "insee": insee,
        "name": np.char.add("Zone ", insee),
        "population": (1000 + (zone * 7919) % 100000).astype(np.int64),
        "adm_weight": (1 + zone % 6).astype(np.int64),
        "min_cp": np.char.zfill(((zone + 1) * 10).astype("U"), 5),
        "postal_code": np.char.add("P", insee),
    })


# Fixed expire-tile set (z/x/y, mixed zooms) driving incremental recompute
# (reference bano/models.py:305-360); bboxes intersect a known zone subset.
EXPIRE_TILES = [
    (16, 33186, 22561),
    (14, 8294, 5643),
    (11, 1037, 705),
    (16, 32859, 23830),
    (12, 2127, 1397),
    # coarse tile straddling metro zone 00034's 2×2 arrondissement boundary
    # (exercises the multi-arrondissement expiry of the G9 metropolis rule)
    (10, 520, 352),
]


# ---------------------------------------------------------------------------
# Embedding near-dup planting (mirrors the planted phash duplicate pairs):
# every NEARDUP_MOD-th base vector gains a deterministically perturbed twin
# at vec_id + NEARDUP_OFFSET with cosine ≳ 0.9999 — the pairs the
# embedding-cosine near-dup operator must recover.
# ---------------------------------------------------------------------------

NEARDUP_MOD = 25
NEARDUP_OFFSET = 10_000_000
NEARDUP_EPS = 0.001


def plant_neardup_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("vec_id").to_numpy()
    sel = (ids % NEARDUP_MOD) == 0
    base = pa.table({"vec_id": batch.column("vec_id"),
                     "embedding": batch.column("embedding")})
    if not sel.any():
        return base
    vec = np.stack([np.asarray(v, dtype=np.float32)
                    for v in batch.column("embedding").to_pylist()])[sel]
    sid = ids[sel]
    dim = vec.shape[1]
    h = stream(sid[:, None] * 131 + np.arange(dim)[None, :], 14) % 2001
    noise = ((h - 1000) / 1000.0 * NEARDUP_EPS).astype(np.float32)
    dup = vec + noise
    dup_t = pa.table({
        "vec_id": pa.array(sid + NEARDUP_OFFSET, type=pa.int64()),
        "embedding": pa.array([row for row in dup.tolist()],
                              type=base.column("embedding").type),
    })
    return pa.concat_tables([base, dup_t])


def embeddings_dataset(sf_dir: str):
    """Embeddings table with planted near-dup twins (pure function of the
    driver-generated base vectors — no external data)."""
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"]) \
        .map_batches(plant_neardup_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Postal-code dim (reference codes_postaux): several rows per zone with a
# ligne_5 qualifier; the communes export picks rank 1 over (ligne_5, cp).
# ---------------------------------------------------------------------------

COMMUNE_TYPES = ["municipality", "village", "town", "city"]


def postal_codes_table() -> pa.Table:
    zones = np.arange(NZONES, dtype=np.int64)
    insee = insee_of_zone(zones).astype(object)
    cp0 = (zones + 1) * 10
    rows_insee, rows_cp, rows_l5 = [], [], []
    for i, z in enumerate(zones):
        rows_insee += [insee[i]] * 3
        rows_cp += [str(cp0[i]).zfill(5), str(cp0[i] + 3).zfill(5),
                    str(cp0[i] + 7).zfill(5)]
        rows_l5 += ["", "", "CEDEX A"]
    return pa.table({"insee": rows_insee, "cp": rows_cp, "ligne_5": rows_l5})


def postal_polygons_wkb() -> list[tuple[str, bytes]]:
    """Postal polygons with NESTING: per zone, the full zone box keyed
    'P<insee>' plus an inner box (central half-spans, 1/4 the area) keyed
    'Q<insee>' — points in the inner box must resolve to 'Q<insee>' through
    the smallest-area tie-break (reference ORDER BY ST_Area, G8)."""
    from .geo.wkb import encode_polygon

    out = []
    for zx in range(NZX):
        for zy in range(NZY):
            x0 = LON0 + LON_SPAN * zx / NZX
            x1 = LON0 + LON_SPAN * (zx + 1) / NZX
            y0 = LAT0 + LAT_SPAN * zy / NZY
            y1 = LAT0 + LAT_SPAN * (zy + 1) / NZY
            cx = LON0 + LON_SPAN * (zx + 0.5) / NZX
            cy = LAT0 + LAT_SPAN * (zy + 0.5) / NZY
            hx = LON_SPAN / (4.0 * NZX)
            hy = LAT_SPAN / (4.0 * NZY)
            insee = str(zx * NZY + zy + 1).zfill(5)
            ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
            inner = np.array([[cx - hx, cy - hy], [cx + hx, cy - hy],
                              [cx + hx, cy + hy], [cx - hx, cy + hy],
                              [cx - hx, cy - hy]])
            out.append(("P" + insee, encode_polygon([ring])))
            out.append(("Q" + insee, encode_polygon([inner])))
    return out
