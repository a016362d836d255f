"""Checkpoint-gated pipeline runner.

The reference orchestrates its stages with Snakemake: each rule reads the
previous stage's Parquet checkpoint, writes its own, and is skipped when
its ``_SUCCESS`` marker already exists (reference
tests/resources/ensembl/workflow.snakefile, src/ketl/spark/utils.py
check-path contract). This module provides the same incremental-rerun
surface natively, so a pipeline can be expressed and resumed without an
external workflow engine (and still interoperates with one — the on-disk
contract is identical: Parquet dirs + ``_SUCCESS`` markers).

A :class:`Pipeline` is a DAG of named stages. Each stage's ``fn`` takes
``(spark, inputs)`` where ``inputs`` maps dependency names to their
checkpointed DataFrames, and returns the DataFrame to checkpoint. Stages
whose checkpoint is up to date are not recomputed (their DataFrame is
lazily re-read from Parquet). ``force`` re-runs a stage and everything
downstream of it.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from . import checkpoint

StageFn = Callable[[SparkSession, dict[str, DataFrame]], DataFrame]


@dataclass
class Stage:
    name: str
    fn: StageFn
    deps: tuple[str, ...] = ()
    target_partition_bytes: int | None = checkpoint.DEFAULT_TARGET_PARTITION_BYTES


@dataclass
class StageResult:
    name: str
    ran: bool  # False = checkpoint reused
    path: str
    n_rows: int | None = None  # observed during the write; None when reused


class Pipeline:
    def __init__(self, base_dir: str | Path, name: str = "pipeline"):
        self.base_dir = Path(base_dir)
        self.name = name
        self._stages: dict[str, Stage] = {}
        self._order: list[str] = []

    def stage(
        self,
        name: str,
        deps: Sequence[str] = (),
        target_partition_bytes: int | None = checkpoint.DEFAULT_TARGET_PARTITION_BYTES,
    ) -> Callable[[StageFn], StageFn]:
        """Decorator registering a stage; declaration order is respected
        within the constraints of ``deps``."""

        def register(fn: StageFn) -> StageFn:
            if name in self._stages:
                raise ValueError(f"duplicate stage {name!r}")
            missing = [d for d in deps if d not in self._stages]
            if missing:
                raise ValueError(
                    f"stage {name!r} depends on undeclared stage(s) {missing}"
                )
            self._stages[name] = Stage(name, fn, tuple(deps), target_partition_bytes)
            self._order.append(name)
            return fn

        return register

    def path_of(self, stage: str) -> str:
        return str(self.base_dir / f"{stage}.parquet")

    def run(
        self,
        spark: SparkSession,
        targets: Sequence[str] | None = None,
        force: Sequence[str] = (),
    ) -> list[StageResult]:
        """Execute (or reuse) every stage needed for ``targets`` (default:
        all), in declaration order. Returns per-stage results."""
        wanted = self._closure(targets)
        forced = self._downstream_closure(force)
        results: list[StageResult] = []
        for name in self._order:
            if name not in wanted:
                continue
            st = self._stages[name]
            out = self.path_of(name)
            dep_forced = name in forced
            if checkpoint.is_done(out) and not dep_forced:
                results.append(StageResult(name, ran=False, path=out))
                continue
            inputs = {
                d: checkpoint.load(self.path_of(d), spark) for d in st.deps
            }
            df = st.fn(spark, inputs)
            # row count observed DURING the checkpoint write (df.observe)
            # — per-stage metrics at zero extra scans
            from ..functions.metrics import pipeline_counters

            df, obs = pipeline_counters(df)
            checkpoint.save(
                df, out, target_partition_bytes=st.target_partition_bytes
            )
            n_rows = obs.get.get("n_rows")
            results.append(
                StageResult(name, ran=True, path=out, n_rows=n_rows)
            )
        return results

    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        return checkpoint.load(self.path_of(stage), spark)

    # -- dependency closures -------------------------------------------------

    def _closure(self, targets: Sequence[str] | None) -> set[str]:
        if targets is None:
            return set(self._stages)
        seen: set[str] = set()

        def visit(n: str) -> None:
            if n in seen:
                return
            if n not in self._stages:
                raise KeyError(f"unknown stage {n!r}")
            seen.add(n)
            for d in self._stages[n].deps:
                visit(d)

        for t in targets:
            visit(t)
        return seen

    def _downstream_closure(self, roots: Sequence[str]) -> set[str]:
        out = set(roots)
        changed = True
        while changed:
            changed = False
            for name, st in self._stages.items():
                if name not in out and any(d in out for d in st.deps):
                    out.add(name)
                    changed = True
        return out
