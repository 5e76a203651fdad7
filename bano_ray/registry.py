"""User-extension surface (SURVEY.md §2.11): step registry + pipeline spec.

The reference's extension points are a CLI subcommand table
(``bano/bin.py:16-196``) and a SQL-template plugin convention (a step = a
named ``.sql`` file with ``__com__``-style substitution,
``bano/core.py:61-85``).  The engine equivalent:

- **Step registry**: ``@step(name)`` registers a named stage — either a
  batch callable (wrapped in ``map_batches``) or a dataset-level transform
  (``kind="dataset"``).  Third-party code registers steps the same way the
  reference dropped in ``.sql`` files.
- **Pipeline spec**: a YAML/dict document ``{source: ..., steps: [...]}``
  compiled by :func:`build_pipeline` into a lazy Ray Dataset — the
  ``__com__`` substitution analog is the ``params`` mapping interpolated
  into step arguments.

Every built-in stage of the engine is registered below, so a user can
re-compose the flagship from a spec file (tests do exactly that).
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, dict] = {}


def step(name: str, kind: str = "batch", schema: list[str] | None = None):
    """Register a pipeline step.

    kind="batch":   fn(batch: pa.Table, **args) -> pa.Table (map_batches)
    kind="dataset": fn(ds, **args) -> ds
    kind="source":  fn(**args) -> ds
    """
    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = {"fn": fn, "kind": kind, "schema": schema or []}
        return fn

    return deco


def get_step(name: str) -> dict:
    if name not in _REGISTRY:
        raise KeyError(f"unknown step {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_steps() -> dict[str, dict]:
    _ensure_builtins()
    return {k: {"kind": v["kind"], "schema": v["schema"]}
            for k, v in sorted(_REGISTRY.items())}


def _interp(value: Any, params: dict) -> Any:
    """``$name`` parameter substitution (the ``__com__`` analog)."""
    if isinstance(value, str) and value.startswith("$"):
        key = value[1:]
        if key not in params:
            raise KeyError(f"pipeline param {key!r} not provided")
        return params[key]
    if isinstance(value, dict):
        return {k: _interp(v, params) for k, v in value.items()}
    if isinstance(value, list):
        return [_interp(v, params) for v in value]
    return value


def build_pipeline(spec: dict | str, **params):
    """Compile a pipeline spec into a lazy Ray Dataset.

    ``spec`` is a dict (or YAML string) of the form::

        source: {step: images, args: {sf_dir: $sf_dir}}
        steps:
          - {step: parse_caption}
          - {step: zone_assign}

    Steps run in order; ``$name`` strings in args resolve from ``params``.
    """
    _ensure_builtins()
    if isinstance(spec, str):
        import yaml

        spec = yaml.safe_load(spec)
    src = spec["source"]
    # fail fast: resolve every step before any execution
    for st in [src] + list(spec.get("steps", [])):
        get_step(st["step"])
    entry = get_step(src["step"])
    if entry["kind"] != "source":
        raise ValueError(f"{src['step']!r} is not a source step")
    ds = entry["fn"](**_interp(src.get("args", {}), params))
    for st in spec.get("steps", []):
        entry = get_step(st["step"])
        args = _interp(st.get("args", {}), params)
        if entry["kind"] == "dataset":
            ds = entry["fn"](ds, **args)
        elif entry["kind"] == "batch":
            fn = entry["fn"]
            if args:
                import functools

                fn = functools.partial(fn, **args)
            ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
        else:
            raise ValueError(f"step {st['step']!r} has kind {entry['kind']!r}")
    return ds


_BUILTINS_DONE = False


def _ensure_builtins() -> None:
    """Register the engine's own stages (idempotent, import-cycle safe)."""
    global _BUILTINS_DONE
    if _BUILTINS_DONE:
        return
    _BUILTINS_DONE = True

    from . import datagen
    from .runtime import ensure_worker_importable
    from .stages.parse import encode_cells, parse_caption

    ensure_worker_importable()

    @step("images", kind="source", schema=["doc_id", "image_id", "caption", "lon", "lat"])
    def _images(sf_dir: str, expand: int = 1, with_bytes: bool = False):
        return datagen.images_dataset(sf_dir, with_bytes=with_bytes, expand=expand)

    @step("parse_caption", schema=["hn", "street", "street_key"])
    def _parse(batch):
        return parse_caption(batch)

    @step("encode_cells", schema=["cell"])
    def _cells(batch, res: int = 12):
        return encode_cells(batch, res=res)

    @step("zone_assign", kind="dataset", schema=["insee", "zone_via_bbox"])
    def _assign(ds):
        import ray

        from .stages.parse import make_zone_assigner

        zones_ref = ray.put(datagen.zone_boxes_wkb())
        return ds.map_batches(make_zone_assigner(zones_ref),
                              batch_format="pyarrow", batch_size=None)

    @step("zone_assign_cosharded", kind="dataset", schema=["insee", "zone_via_bbox"])
    def _assign_sharded(ds):
        from .geo.pip_sharded import assign_zones_cosharded

        return assign_zones_cosharded(ds, datagen.zone_boxes_wkb())

    @step("suffix_decorate", kind="dataset", schema=["street_key"])
    def _suffix(ds, sf_dir: str, expand: int = 1):
        from .pipelines.cumul import suffix_centers_ref
        from .stages.suffix import make_suffix_decorator

        ref = suffix_centers_ref(sf_dir, expand=expand)
        return ds.map_batches(make_suffix_decorator(ref),
                              batch_format="pyarrow", batch_size=None)

    @step("merge_cumul", kind="dataset", schema=["rec_type", "insee", "street_key"])
    def _merge(ds, sf_dir: str = "", expand: int = 1):
        import pyarrow as _pa
        import ray

        from .pipelines.cumul import _tag_points
        from .stages.merge_partial import (finalize_group,
                                           label_partial_arrow,
                                           partial_from_points_fast,
                                           registry_partials)

        tagged = ds.map_batches(_tag_points, batch_format="pyarrow", batch_size=None)
        par = tagged.map_batches(partial_from_points_fast,
                                 batch_format="pyarrow", batch_size=None)
        # Union the street-label pre-pass (point_par_rue, G5) when the spec
        # names its corpus — exactly as pipelines/cumul.partial_dataset does
        if sf_dir:
            from .stages.label import street_labels

            lab = street_labels(sf_dir, expand=expand) \
                .map_batches(label_partial_arrow, batch_format="pandas",
                             batch_size=None)
            par = par.union(lab)
        # Union the FANTOIR registry partials exactly as
        # pipelines/cumul.partial_dataset does — without them the merged
        # rows lack registry matching (fantoir ids, match flags,
        # registry-sourced voie rows), silently diverging from
        # cumul_dataset's output when the flagship is re-composed from a
        # pipeline spec.
        reg = ray.data.from_arrow(_pa.Table.from_pandas(registry_partials(),
                                                        preserve_index=False))
        return par.union(reg).groupby(["insee", "salt"]).map_groups(
            finalize_group, batch_format="pandas")

    @step("filter", kind="dataset")
    def _filter(ds, expr: str):
        return ds.filter(expr=expr)

    @step("select", kind="dataset")
    def _select(ds, columns: list[str]):
        return ds.select_columns(columns)

    @step("write_csv", kind="dataset")
    def _write_csv(ds, out_dir: str):
        from .pipelines.sinks import write_csv_partitioned

        write_csv_partitioned(ds, out_dir)
        return ds

    @step("write_shapefile", kind="dataset")
    def _write_shp(ds, out_dir: str, partition_col: str = "ville"):
        from .sources_io_shp import write_shapefile_partitioned

        return write_shapefile_partitioned(ds, out_dir, partition_col=partition_col)
