"""Distributed quality report — the reference's row-granular report
(quality_report.py:229-273) re-planned as ONE wide select + ONE explode.

The reference runs O(columns × rules) Spark actions, collecting failing
ROW_IDs to the driver per column and assembling pandas frames
(quality_report.py:143-145,265-271).  Here every (column, rule) pair
becomes a boolean expression inside a single projection; failures become
an array of hit structs, array_compact + explode turns them into report
rows — all distributed, the source is scanned once, and Catalyst
whole-stage-codegens the entire rule battery.

Report schema matches quality_report.py:237-239:
  AWS_ACCOUNT_NAME, S3_BUCKET, TABLE_NAME, COLUMN_NAME,
  VALIDATION_CATEGORY, VALIDATION_ID, VALIDATION_MESSAGE,
  PRIMARY_KEY_COLUMN, PRIMARY_KEY_VALUE, TIMESTAMP
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import RulesConfig
from ..rules import contract as C

REPORT_COLUMNS = [
    "AWS_ACCOUNT_NAME", "S3_BUCKET", "TABLE_NAME", "COLUMN_NAME",
    "VALIDATION_CATEGORY", "VALIDATION_ID", "VALIDATION_MESSAGE",
    "PRIMARY_KEY_COLUMN", "PRIMARY_KEY_VALUE", "TIMESTAMP",
]

_REPORT_SCHEMA = T.StructType([
    T.StructField("AWS_ACCOUNT_NAME", T.StringType()),
    T.StructField("S3_BUCKET", T.StringType()),
    T.StructField("TABLE_NAME", T.StringType()),
    T.StructField("COLUMN_NAME", T.StringType()),
    T.StructField("VALIDATION_CATEGORY", T.StringType()),
    T.StructField("VALIDATION_ID", T.IntegerType()),
    T.StructField("VALIDATION_MESSAGE", T.StringType()),
    T.StructField("PRIMARY_KEY_COLUMN", T.StringType()),
    T.StructField("PRIMARY_KEY_VALUE", T.StringType()),
    T.StructField("TIMESTAMP", T.StringType()),
])


def row_fail_hits(
    df: DataFrame, config: RulesConfig, check_cols: list[str] | None = None
) -> DataFrame:
    """Add a ``__hits`` array<struct<column,rule_id>> column flagging every
    (column, rule) failure on each row, in one projection.

    Covers rules 3 (null, all checked columns — the reference excludes only
    ROW_ID, quality_report.py:143), 16 (PII, all checked columns —
    quality_report.py:261), and 4-15 (datatype per config).  Rule 17
    (duplicate) needs a window and is added separately.
    """
    if check_cols is None:
        check_cols = list(df.columns)
    hit_exprs = []
    data_cols_up = {c.upper(): c for c in check_cols}

    def hit(col_name: str, rule_id: int, fail: F.Column):
        return F.when(
            fail,
            F.struct(
                F.lit(col_name.upper()).alias("column"),
                F.lit(rule_id).alias("rule_id"),
            ),
        )

    for c in check_cols:
        col = F.col(f"`{c}`")
        hit_exprs.append(hit(c, 3, C.null_fail(col)))
        hit_exprs.append(hit(c, 16, C.pii_fail(col.cast(T.StringType()))))

    for spec in config.columns:
        c = data_cols_up.get(spec.name_upper)
        if c is None or not spec.data_type:
            continue
        col = F.col(f"`{c}`")
        fail = C.datatype_fail_expr(spec.data_type, col, spec.length_total)
        if fail is None:  # unknown datatype → skipped (validation_rulebook.py:687)
            continue
        rule_id = C.DATATYPE_RULE_IDS[spec.data_type]
        hit_exprs.append(hit(c, rule_id, fail))

    return df.withColumn("__hits", F.array_compact(F.array(*hit_exprs)))


def schema_level_report(
    spark: SparkSession,
    data_columns: list[str],
    config: RulesConfig,
    table_name: str,
    account_name: str | None = None,
    bucket: str | None = None,
) -> DataFrame:
    """Rules 1/2 — schema reconciliation (driver-side column lists, tiny)."""
    meta_cols = config.attribute_names()
    rows = []
    for col_name in C.columns_not_in_metadata(data_columns, meta_cols):
        rows.append((col_name, 1))
    for col_name in C.columns_not_in_data(data_columns, meta_cols):
        rows.append((col_name, 2))
    data = [
        (
            account_name, bucket, table_name, col_name,
            C.RULES[rid][1], rid, C.RULES[rid][2],
            None, None, None,
        )
        for col_name, rid in rows
    ]
    return spark.createDataFrame(data, _REPORT_SCHEMA)


def build_quality_report(
    df: DataFrame,
    config: RulesConfig,
    table_name: str,
    key_cols: list[str] | None = None,
    account_name: str | None = None,
    bucket: str | None = None,
    include_duplicate_rule: bool = True,
    include_report_id: bool = True,
) -> DataFrame:
    """Full report: schema rules ∪ exploded row-level rule hits ∪ duplicates.

    ``key_cols``: natural primary key (e.g. ['conv_id','turn_idx']) — the
    scalable replacement for the reference's global-window ROW_ID
    (validation_rulebook.py:102-103, the single-task shuffle bug).  When
    None, a ROW_ID is synthesized with the same global-window semantics
    for small-fixture parity only.

    ``include_report_id``: prepend the reference's 1-based ``DQ_REPORT_ID``
    surrogate (quality_report.py:207-208, ``np.arange`` over the assembled
    frame) over the deterministic total order (VALIDATION_ID, COLUMN_NAME,
    PRIMARY_KEY_VALUE).  Composed SCALE-SAFELY as group offset +
    per-group ``row_number``: rows rank inside their (VALIDATION_ID,
    COLUMN_NAME) partition (parallel across rules × columns), per-group
    counts cumulate into starting offsets (tiny window — at most
    rules × columns rows), and the offsets broadcast-join back.  The IDs
    are numerically identical to a global ``row_number`` over the same
    order, with no global unpartitioned window anywhere in the plan.
    Residual skew bound: one (rule, column) pair with k failures ranks k
    rows in one task — pathological only when a single rule/column fails
    for a large fraction of a 100-TB table; pass False to skip the id
    entirely in that regime.
    """
    spark = df.sparkSession
    df = C.normalize_column_names(df)

    if key_cols is None:
        from pyspark.sql import Window

        df = df.withColumn(
            "ROW_ID",
            F.row_number().over(Window.orderBy(F.monotonically_increasing_id())),
        )
        key_cols = ["ROW_ID"]
    pk_col = ",".join(key_cols)
    pk_val = F.concat_ws("|", *[F.col(k).cast(T.StringType()) for k in key_cols])

    content_cols = [c for c in df.columns if c not in key_cols]

    hits_df = row_fail_hits(df, config, check_cols=content_cols)
    if include_duplicate_rule:
        dup = C.duplicate_fail(hits_df, content_cols, key_cols[0])
        hits_df = hits_df.withColumn(
            "__hits",
            F.when(
                dup,
                F.concat(
                    F.col("__hits"),
                    F.array(F.struct(
                        F.lit(None).cast(T.StringType()).alias("column"),
                        F.lit(17).alias("rule_id"),
                    )),
                ),
            ).otherwise(F.col("__hits")),
        )

    exploded = hits_df.select(
        pk_val.alias("PRIMARY_KEY_VALUE"),
        F.explode("__hits").alias("hit"),
    )

    # rule_id -> category/message lookup as a literal map (tiny, constant-folded)
    cat_map = F.create_map(*[x for rid, (_, cat, _) in C.RULES.items()
                             for x in (F.lit(rid), F.lit(cat))])
    msg_map = F.create_map(*[x for rid, (_, _, msg) in C.RULES.items()
                             for x in (F.lit(rid), F.lit(msg))])

    row_level = exploded.select(
        F.lit(account_name).cast(T.StringType()).alias("AWS_ACCOUNT_NAME"),
        F.lit(bucket).cast(T.StringType()).alias("S3_BUCKET"),
        F.lit(table_name).alias("TABLE_NAME"),
        F.col("hit.column").alias("COLUMN_NAME"),
        cat_map[F.col("hit.rule_id")].alias("VALIDATION_CATEGORY"),
        F.col("hit.rule_id").alias("VALIDATION_ID"),
        msg_map[F.col("hit.rule_id")].alias("VALIDATION_MESSAGE"),
        F.lit(pk_col).alias("PRIMARY_KEY_COLUMN"),
        F.col("PRIMARY_KEY_VALUE"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias("TIMESTAMP"),
    )

    schema_level = schema_level_report(
        spark, df.columns, config, table_name, account_name, bucket
    ).withColumn("TIMESTAMP", F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss"))

    report = schema_level.unionByName(row_level)
    if include_report_id:
        from pyspark.sql import Window

        # group offset + per-group rank == global row_number over
        # (VALIDATION_ID, COLUMN_NAME, PRIMARY_KEY_VALUE), but ranking
        # runs parallel per (rule, column) partition and only the tiny
        # per-group count table (≤ rules × columns rows) sees a global
        # cumulative window.
        in_group = Window.partitionBy("VALIDATION_ID", "COLUMN_NAME").orderBy(
            F.col("PRIMARY_KEY_VALUE").asc_nulls_first()
        )
        ranked = report.withColumn(
            "__rn", F.row_number().over(in_group)
        )
        counts = report.groupBy("VALIDATION_ID", "COLUMN_NAME").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        cum = Window.orderBy(
            F.col("VALIDATION_ID").asc_nulls_first(),
            F.col("COLUMN_NAME").asc_nulls_first(),
        ).rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.select(
            "VALIDATION_ID", "COLUMN_NAME",
            F.coalesce(F.sum("__cnt").over(cum), F.lit(0)).alias("__off"),
        )
        report = (
            ranked.join(
                F.broadcast(offsets),
                on=_nullsafe_eq(ranked, offsets, ["VALIDATION_ID", "COLUMN_NAME"]),
            )
            .select(
                (F.col("__off") + F.col("__rn")).cast("int").alias("DQ_REPORT_ID"),
                *[ranked[c] for c in ranked.columns if not c.startswith("__")],
            )
        )
    return report


def _nullsafe_eq(left: DataFrame, right: DataFrame, cols: list[str]):
    """Join condition using null-safe equality (COLUMN_NAME is NULL for
    schema-level and duplicate-rule rows)."""
    cond = None
    for c in cols:
        eq = left[c].eqNullSafe(right[c])
        cond = eq if cond is None else cond & eq
    return cond
