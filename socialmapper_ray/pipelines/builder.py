"""Fluent pipeline builder — the public "query language" (§2.10).

Mirrors the reference's user-extension surface:
- ``SocialMapperBuilder.with_*`` fluent config (api/builder.py:52-239),
- named ``PipelineStage(name, fn)`` list run by an orchestrator
  (pipeline/orchestrator.py:101-162), stage outputs addressable by name,
- ``Ok``/``Err`` result monad on ``run()`` (api/result_types.py),
- exporter strategy plug-in (export/base.py:86-127 -> sources.sinks),
- UDF hook: ``with_stage(name, fn)`` where fn: Dataset -> Dataset.

The crucial difference from the reference: stages chain **lazily** on
one ``ray.data.Dataset`` — nothing materialises between stages (the
reference stashes full outputs in driver memory,
orchestrator.py:283-339). ``stage_output(name)`` re-runs the lazy
prefix when asked, which Ray Data serves from its plan, not from RAM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from ..sources import sinks, synth
from ..stages import bands as bands_mod
from ..stages import enrich as enrich_mod
from ..stages import extract as extract_mod
from ..stages import knn as knn_mod
from ..stages import pip_join as pip_mod
from ..stages import tile as tile_mod
from ..stages import zonal as zonal_mod


@dataclass
class Ok:
    value: Any

    def is_ok(self) -> bool:
        return True

    def unwrap(self):
        return self.value


@dataclass
class Err:
    error: Exception

    def is_ok(self) -> bool:
        return False

    def unwrap(self):
        raise self.error


@dataclass
class PipelineStage:
    name: str
    fn: Callable[[Any], Any]
    description: str = ""


@dataclass
class Pipeline:
    source: Callable[[], Any]
    stages: list[PipelineStage]
    export_spec: tuple[str, str] | None = None

    def run(self):
        """Execute all stages; Ok(final Dataset | export path) / Err."""
        try:
            ds = self.source()
            for st in self.stages:
                ds = st.fn(ds)
            if self.export_spec is not None:
                out_dir, fmt = self.export_spec
                return Ok(sinks.export(ds, out_dir, fmt))
            return Ok(ds)
        except Exception as e:  # noqa: BLE001 — monad surface
            return Err(e)

    def stage_output(self, name: str):
        """Lazy Dataset as of the named stage (prefix re-chained)."""
        ds = self.source()
        for st in self.stages:
            ds = st.fn(ds)
            if st.name == name:
                return ds
        raise KeyError(name)

    @property
    def stage_names(self) -> list[str]:
        return [s.name for s in self.stages]


class PipelineBuilder:
    """``PipelineBuilder().with_pages(sf).with_extract().with_pip_join()
    .build().run()``"""

    def __init__(self):
        self._source: Callable[[], Any] | None = None
        self._stages: list[PipelineStage] = []
        self._export: tuple[str, str] | None = None
        self._sf_dir: str | None = None

    # -- sources ----------------------------------------------------------
    def with_pages(self, sf_dir: str, replicate: int = 1) -> "PipelineBuilder":
        from .flagship import read_pages

        self._sf_dir = sf_dir
        self._source = lambda: read_pages(sf_dir, replicate)
        return self

    def with_source(self, factory: Callable[[], Any]) -> "PipelineBuilder":
        self._source = factory
        return self

    # -- built-in stages --------------------------------------------------
    def with_extract(self) -> "PipelineBuilder":
        self._stages.append(PipelineStage(
            "extract", extract_mod.extract_pois,
            "pages -> POIs (html dropped)"))
        return self

    def with_validation(self) -> "PipelineBuilder":
        self._stages.append(PipelineStage(
            "validate", lambda ds: ds.filter(expr="valid == True"),
            "drop rows failing coordinate validation"))
        return self

    def with_tiles(self, **kw) -> "PipelineBuilder":
        self._stages.append(PipelineStage(
            "tile", lambda ds: tile_mod.tile_points(ds, **kw),
            "attach quadcell/hexcell/part_key"))
        return self

    def _need_sf(self) -> str:
        if self._sf_dir is None:
            raise ValueError("with_pages(sf_dir) must come first")
        return self._sf_dir

    def with_pip_join(self, keep_cols=("url",), **kw) -> "PipelineBuilder":
        sf = self._need_sf()

        def fn(ds):
            ref = pip_mod.build_zone_index(synth.table_path(sf, "zones"))
            return pip_mod.pip_join(ds, ref, keep_cols=keep_cols, **kw)

        self._stages.append(PipelineStage("pip_join", fn,
                                          "points x zones containment"))
        return self

    def with_knn(self, keep_cols=("url",), **kw) -> "PipelineBuilder":
        sf = self._need_sf()

        def fn(ds):
            ref = knn_mod.centers_ref_from_parquet(
                synth.table_path(sf, "band_centers"))
            return knn_mod.knn_nearest(ds, ref, keep_cols=keep_cols, **kw)

        self._stages.append(PipelineStage("knn", fn, "nearest facility"))
        return self

    def with_bands(self, keep_cols=("url",), **kw) -> "PipelineBuilder":
        sf = self._need_sf()

        def fn(ds):
            ref = knn_mod.centers_ref_from_parquet(
                synth.table_path(sf, "band_centers"))
            return bands_mod.assign_bands(ds, ref, keep_cols=keep_cols, **kw)

        self._stages.append(PipelineStage("bands", fn,
                                          "travel-time band assignment"))
        return self

    def with_zonal(self, value_col: str | None = None) -> "PipelineBuilder":
        self._stages.append(PipelineStage(
            "zonal", lambda ds: zonal_mod.zonal_counts(ds, value_col),
            "per-zone aggregate"))
        return self

    def with_enrichment(self) -> "PipelineBuilder":
        sf = self._need_sf()

        def fn(ds):
            ref = enrich_mod.demographics_ref(
                synth.table_path(sf, "demographics"))
            return enrich_mod.enrich(ds, ref)

        self._stages.append(PipelineStage("enrich", fn,
                                          "demographics left join"))
        return self

    # -- extension hooks --------------------------------------------------
    def with_stage(self, name: str, fn: Callable[[Any], Any],
                   description: str = "") -> "PipelineBuilder":
        """UDF hook: any Dataset -> Dataset transform."""
        self._stages.append(PipelineStage(name, fn, description))
        return self

    def with_checkpoint(self, out_dir: str, inputs: list[str] | None = None,
                        partition_col: str | None = None) \
            -> "PipelineBuilder":
        """Persist the chain-so-far to parquet + lineage manifest; a
        rerun with unchanged inputs resumes from the checkpoint instead
        of recomputing (state/manifest.py — the north rule's
        checkpoint-resume at a stage boundary)."""
        from ..state import manifest

        if self._source is None:
            raise ValueError("with_pages/with_source must come first")
        sf = self._sf_dir
        ckpt_inputs = inputs if inputs is not None else (
            [synth.table_path(sf, "pages")] if sf else [])
        stage_name = f"ckpt_{len(self._stages)}"
        prior_names = [s.name for s in self._stages]

        def fn(ds):
            # `ds` is the lazily-chained prefix; checkpoint_stage either
            # executes+persists it or (manifest hit) never runs it at all
            return manifest.checkpoint_stage(
                lambda: ds, out_dir, stage=stage_name, inputs=ckpt_inputs,
                params={"stages": prior_names},
                partition_col=partition_col)

        self._stages.append(PipelineStage(
            stage_name, fn, f"checkpoint -> {out_dir}"))
        return self

    def with_export(self, out_dir: str, fmt: str = "parquet") \
            -> "PipelineBuilder":
        self._export = (out_dir, fmt)
        return self

    def build(self) -> Pipeline:
        if self._source is None:
            raise ValueError("a source is required (with_pages/with_source)")
        return Pipeline(self._source, list(self._stages), self._export)
