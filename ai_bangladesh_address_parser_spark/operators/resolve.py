"""Stage 8: evidence-weighted conflict resolution as pure groupBy/window.

Reference semantics (src/core/stages/conflict_resolver.py:33-125):
  * postal evidence must match ^\\d{4}$ (else dropped);
  * all evidences agree → avg confidence × 1.05 capped at 0.99,
    source = argmax-confidence evidence (consensus bonus);
  * disagreement → weighted vote sum(confidence × source_weight) per
    value; winning value's best evidence confidence × 0.90, conflict
    flag (conflict penalty);
  * per-component threshold re-check may null the component out.

Tie-breaks are pinned to a total order (vote desc, value asc; within a
value: confidence desc, source desc) — the reference depends on Python
list order, which has no distributed equivalent.

Physical plan: one partial-aggregated shuffle on (mention_id,
component, value), then a window on (mention_id, component). No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..reference_semantics import DEFAULT_SOURCE_WEIGHT, SOURCE_WEIGHTS


def _weight_expr(source):
    mapping = F.create_map(*[F.lit(x) for kv in SOURCE_WEIGHTS.items() for x in kv])
    return F.coalesce(mapping[source], F.lit(DEFAULT_SOURCE_WEIGHT))


def resolve_evidence(evidence: DataFrame, thresholds: dict[str, float] | None = None) -> DataFrame:
    """(mention_id, component, value, confidence, source)* →
    (mention_id, component, value, confidence, source, conflict,
    evidence_count) with exactly one row per (mention_id, component)."""
    thresholds = thresholds or {}

    ev = evidence.filter(
        F.col("value").isNotNull() & (F.col("value") != "") & (
            (F.col("component") != "postal_code")
            | F.trim("value").rlike(r"^\d{4}$")
        )
    ).withColumn("weight", _weight_expr(F.col("source")))

    per_value = ev.groupBy("mention_id", "component", "value").agg(
        F.sum(F.col("confidence") * F.col("weight")).alias("vote"),
        F.max(F.struct("confidence", "source")).alias("best"),
        F.count(F.lit(1)).alias("n_ev"),
        F.sum("confidence").alias("sum_conf"),
    )

    w = Window.partitionBy("mention_id", "component")
    wo = w.orderBy(F.col("vote").desc(), F.col("value").asc())
    enriched = per_value.select(
        "*",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_values"),
        F.sum("n_ev").over(w).alias("total_ev"),
        F.sum("sum_conf").over(w).alias("total_conf"),
    )

    resolved = (
        enriched.filter(F.col("rn") == 1)
        .select(
            "mention_id",
            "component",
            "value",
            F.when(
                F.col("n_values") == 1,
                F.least(F.col("total_conf") / F.col("total_ev") * 1.05, F.lit(0.99)),
            ).otherwise(F.col("best.confidence") * 0.90).alias("confidence"),
            F.col("best.source").alias("source"),
            (F.col("n_values") > 1).alias("conflict"),
            F.col("total_ev").alias("evidence_count"),
        )
    )

    if thresholds:
        thr = F.create_map(*[F.lit(x) for kv in thresholds.items() for x in kv])
        resolved = resolved.filter(
            F.col("confidence") >= F.coalesce(thr[F.col("component")], F.lit(0.0))
        )
    return resolved


def resolved_wide(resolved: DataFrame, components: list[str] | None = None) -> DataFrame:
    """Pivot resolved long format to one row per mention with a column
    per component (empty string when absent — reference Stage 9
    output-assembly semantics, extractor.py:288-321) plus
    overall_confidence = mean of resolved component confidences."""
    from ..reference_semantics import ALL_COMPONENTS

    components = components or ALL_COMPONENTS
    wide = (
        resolved.groupBy("mention_id")
        .pivot("component", components)
        .agg(F.first("value"))
    )
    # overall confidence is the mean over *address components* only
    # (reference extractor.py:353-364); `_error` isolation rows
    # (house_road._rows_for_text, D4 semantics) ride along as a
    # separate `error` column instead of depressing the mean.
    conf = (
        resolved.groupBy("mention_id")
        .agg(
            F.avg(F.when(F.col("component") != "_error", F.col("confidence")))
            .alias("overall_confidence"),
            F.max(F.when(F.col("component") == "_error", F.col("value")))
            .alias("error"),
        )
    )
    out = wide.join(conf, "mention_id", "left")
    for c in components:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("")))
    return out
