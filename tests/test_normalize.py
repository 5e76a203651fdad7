"""Golden tests for normalize() — pairs generated from the reference
implementation's observed behavior (bano/helpers.py:106-168) on 478 inputs
covering every rewrite phase."""

import json
from pathlib import Path

import numpy as np
import pytest

from bano_ray.functions.normalize import normalize, normalize_array, normalize_registry_key

GOLDEN = json.loads((Path(__file__).parent / "data_normalize_golden.json").read_text())


def test_reference_own_golden():
    # the reference's only in-repo golden pair (tests/test_helpers.py:23-27)
    assert normalize("Boulevard de Sébastopol") == "BD SEBASTOPOL"


@pytest.mark.parametrize("raw,expected", GOLDEN, ids=lambda v: str(v)[:30])
def test_golden_pairs(raw, expected):
    assert normalize(raw) == expected


def test_normalize_array_matches_scalar():
    raws = [g[0] for g in GOLDEN]
    out = normalize_array(np.array(raws, dtype=object))
    assert list(out) == [g[1] for g in GOLDEN]


def test_registry_key_precollapses_dashes():
    assert normalize_registry_key("RUE JEAN-BAPTISTE  CLEMENT") == normalize("RUE JEAN BAPTISTE CLEMENT")


def test_truncation_to_30():
    assert len(normalize("X" * 80)) == 30
