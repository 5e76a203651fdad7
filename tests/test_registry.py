"""§2.11 extension surface: step registry, YAML pipeline spec, CLI."""

import json

import pytest


def test_step_registry_lists_builtins():
    from bano_ray.registry import list_steps

    steps = list_steps()
    for name in ("images", "parse_caption", "zone_assign", "suffix_decorate",
                 "merge_cumul", "write_shapefile"):
        assert name in steps


def test_custom_step_registration_and_param_interp(ray_session, sf_dir):
    from bano_ray.registry import build_pipeline, step

    @step("double_doc", schema=["doc_id2"])
    def double_doc(batch):
        import pyarrow.compute as pc

        return batch.append_column("doc_id2", pc.multiply(batch.column("doc_id"), 2))

    spec = {
        "source": {"step": "images", "args": {"sf_dir": "$sf"}},
        "steps": [{"step": "double_doc"},
                  {"step": "select", "args": {"columns": ["doc_id", "doc_id2"]}}],
    }
    df = build_pipeline(spec, sf=sf_dir).to_pandas()
    assert (df["doc_id2"] == 2 * df["doc_id"]).all()


def test_yaml_spec_recomposes_points_pipeline(ray_session, sf_dir):
    """A YAML spec re-building the flagship point stream equals the
    hand-written pipeline."""
    from bano_ray.pipelines.cumul import decorated_points_dataset
    from bano_ray.registry import build_pipeline

    yaml_spec = """
source: {step: images, args: {sf_dir: $sf}}
steps:
  - {step: parse_caption}
  - {step: encode_cells}
  - {step: zone_assign}
  - {step: suffix_decorate, args: {sf_dir: $sf}}
"""
    a = (build_pipeline(yaml_spec, sf=sf_dir)
         .select_columns(["doc_id", "insee", "street_key"]).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (decorated_points_dataset(sf_dir)
         .select_columns(["doc_id", "insee", "street_key"]).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_yaml_spec_merge_equals_cumul_dataset(ray_session, sf_dir):
    """The spec-composed merge includes the FANTOIR registry union —
    registry-matched voie rows and match flags equal cumul_dataset's."""
    from bano_ray.pipelines.cumul import cumul_dataset
    from bano_ray.registry import build_pipeline

    yaml_spec = """
source: {step: images, args: {sf_dir: $sf}}
steps:
  - {step: parse_caption}
  - {step: encode_cells}
  - {step: zone_assign}
  - {step: suffix_decorate, args: {sf_dir: $sf}}
  - {step: merge_cumul, args: {sf_dir: $sf}}
"""
    cols = ["rec_type", "insee", "street_key"]
    a = (build_pipeline(yaml_spec, sf=sf_dir).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    b = (cumul_dataset(sf_dir).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    assert sorted(a.columns) == sorted(b.columns)
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    assert a.equals(b)


def test_cli_list_steps_and_run_spec(ray_session, sf_dir, tmp_path, capsys):
    from bano_ray.cli import main

    main(["list-steps"])
    out = json.loads(capsys.readouterr().out)
    assert "merge_cumul" in out

    spec = tmp_path / "pipe.yaml"
    spec.write_text("""
source: {step: images, args: {sf_dir: $sf}}
steps:
  - {step: parse_caption}
  - {step: filter, args: {expr: "hn != ''"}}
""")
    main(["run-spec", str(spec), "--param", f"sf={sf_dir}"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] > 0 and "street_key" in res["schema"]


def test_unknown_step_raises():
    from bano_ray.registry import build_pipeline

    with pytest.raises(KeyError):
        build_pipeline({"source": {"step": "images", "args": {"sf_dir": "x"}},
                        "steps": [{"step": "no_such_step"}]})
