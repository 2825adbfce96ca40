"""Reference-parity pipeline operators (SURVEY.md §2A, R2-R9, R13).

The reference processes each Kinesis record with eager per-row Python
(`/root/reference/lambda_function.py:43-54`):

    base64 decode -> json.loads -> @timestamp := datetime
    -> drop empty ip -> (ES branch) allowlist projection
    -> (ES branch) daily index key + deterministic doc id

Here every step is a declarative DataFrame transformation so Catalyst
fuses the whole chain into one whole-stage-codegen pass over the scan:
no Python executes per row, the JSON parse is vectorized JVM-side, and
column pruning/pushdown reach the source for free.

Scale note (100 TB): the chain is embarrassingly parallel (narrow
transformations only — zero shuffles).  Throughput scales linearly with
executor cores; the only state is the sink.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Projection allowlist for the OpenSearch branch.
# Reference: ES_ALLOWED_FIELDS at lambda_function.py:16-19.
ES_ALLOWED_FIELDS: tuple[str, ...] = (
    "random_id",
    "kind_id",
    "account_id",
    "performer_id",
    "repository_id",
    "ip",
    "metadata",
    "datetime",
    "@timestamp",
)

# Core audit-event schema implied by the reference fixtures
# (test_lambda_function.py:26-45; typed per SURVEY.md §1.3).  The engine
# parses the core schema for the ES branch and keeps the raw JSON string
# alongside so unknown fields survive to the Splunk branch exactly as in
# the reference's schemaless passthrough (lambda_function.py:141,148).
AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.StringType()),       # ISO-8601, no tz
        T.StructField("random_id", T.StringType()),
        T.StructField("kind_id", T.LongType()),
        T.StructField("account_id", T.LongType()),
        T.StructField("performer_id", T.LongType()),
        T.StructField("repository_id", T.LongType()),
        T.StructField("ip", T.StringType()),
        # Dynamic nested object (reference fixture: {"oauth_token_id": 999},
        # test_lambda_function.py:35).  Typed as map<string,string> to stay
        # schemaless over arbitrary keys; DOCUMENTED COERCION: non-string
        # values (the fixture's numeric 999) are rendered as their JSON
        # text ("999") in the map and therefore quoted in the ES _source.
        # tests/test_transforms.py::test_metadata_numeric_value_coercion
        # pins this divergence with the reference's own numeric fixture.
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("request_url", T.StringType()),
        T.StructField("http_method", T.StringType()),
        T.StructField("performer_username", T.StringType()),
        T.StructField("performer_email", T.StringType()),
        T.StructField("performer_kind", T.StringType()),
        T.StructField("auth_type", T.StringType()),
        T.StructField("user_agent", T.StringType()),
        T.StructField("request_id", T.StringType()),
        T.StructField("x_forwarded_for", T.StringType()),
    ]
)


def decode_kinesis(
    df: DataFrame,
    data_col: str = "kinesis_data",
    schema: T.StructType = AUDIT_SCHEMA,
    keep_raw: bool = True,
    tolerant: bool = False,
) -> DataFrame:
    """R2+R3: base64-decode the Kinesis payload and parse the JSON.

    Reference: ``base64.b64decode`` + ``json.loads`` at
    lambda_function.py:45.  `unbase64`/`from_json` are JVM builtins, so
    the decode stays inside whole-stage codegen (no Python per row).

    Failure semantics: with ``tolerant=False`` (default) invalid base64
    fails the batch — the reference's behaviour exactly (a decode error
    in the :141 list comprehension fails the whole Lambda invocation and
    Kinesis redelivers).  ``tolerant=True`` switches to ``try_to_binary``:
    undecodable records become NULL rows that R7 drops (or a dead-letter
    branch captures) and the stream keeps going.

    Returns one column per schema field, plus ``_raw`` (the decoded JSON
    string) when ``keep_raw`` — the schemaless Splunk passthrough.

    The decode is wrapped in a one-element ``explode`` (a Generate
    node): generated attributes are a predicate-pushdown and
    project-collapse barrier, so the base64+JSON work evaluates exactly
    once per record, and downstream null-guards/projections reference
    the materialized struct instead of re-deriving it (without the
    barrier, Catalyst inlines the parse into every consumer and pushes
    the null-filter below any repartition — onto the narrow scan stage).
    """
    if tolerant:
        raw = F.try_to_binary(F.col(data_col), F.lit("base64")).cast("string")
    else:
        raw = F.unbase64(F.col(data_col)).cast("string")
    decoded = F.struct(
        F.from_json(raw, schema).alias("p"), raw.alias("raw")
    )
    out = df.select(
        *[F.col(c) for c in df.columns if c != data_col],
        F.explode(F.array(decoded)).alias("_dec"),
    )
    cols = [F.col("_dec.p." + f.name).alias(f.name) for f in schema.fields]
    if keep_raw:
        cols.append(F.col("_dec.raw").alias("_raw"))
    passthrough = [c for c in df.columns if c != data_col]
    return out.select(*[F.col(c) for c in passthrough], *cols)


def with_event_timestamp(df: DataFrame, source_col: str = "datetime") -> DataFrame:
    """R4: derive ``@timestamp`` as a verbatim copy of ``datetime``.

    Reference: lambda_function.py:46-47 — string copy, no tz
    normalization, set unconditionally.
    """
    return df.withColumn("@timestamp", F.col(source_col))


def nullify_empty_ip(df: DataFrame, col: str = "ip") -> DataFrame:
    """R5: drop a falsy ``ip`` (empty string -> absent).

    Reference: lambda_function.py:48-49 pops the key when
    ``not message["ip"]``.  Spark columns are fixed-arity, so "absent"
    is NULL here; absent-vs-null parity is restored at JSON
    serialization time (``to_json`` omits null fields by default),
    matching the reference's sink-visible behaviour.
    """
    if col not in df.columns:
        return df
    return df.withColumn(col, F.nullif(F.col(col), F.lit("")))


def project_es(df: DataFrame, allowed: tuple[str, ...] = ES_ALLOWED_FIELDS) -> DataFrame:
    """R6: allowlist projection for the OpenSearch branch.

    Reference: ``_filter_for_es`` dict comprehension at
    lambda_function.py:52-54.  Expressed as a ``select`` so Catalyst's
    ColumnPruning pushes the narrow read all the way to the source scan.
    Fields absent from the frame are simply not selected (dict-semantics
    parity: the comprehension keeps only keys present in the record).
    """
    keep = [c for c in allowed if c in df.columns]
    return df.select(*[df[c] for c in keep])


def daily_index_col(
    prefix: str, datetime_col: str = "datetime"
) -> Column:
    """R8: daily index routing key: ``prefix + yyyy-MM-dd(datetime)``.

    Reference: lambda_function.py:80 —
    ``index_prefix + str(datetime.fromisoformat(...).date())``.
    """
    return F.concat(
        F.lit(prefix),
        F.date_format(F.to_timestamp(F.col(datetime_col)), "yyyy-MM-dd"),
    ).alias("es_index")


def with_daily_index(
    df: DataFrame, prefix: str, datetime_col: str = "datetime"
) -> DataFrame:
    """R8 as a transform: add the ``es_index`` routing column."""
    return df.withColumn("es_index", daily_index_col(prefix, datetime_col))


def drop_null_records(df: DataFrame, key_col: str = "random_id") -> DataFrame:
    """R7: skip records that failed decode (None-guard).

    Reference: ``if message is None: continue`` in both sinks
    (lambda_function.py:78-79,117-119).  A record whose JSON failed to
    parse has a NULL key column after ``from_json``.
    """
    return df.filter(F.col(key_col).isNotNull())


def dedup_by_doc_id(df: DataFrame, id_col: str = "random_id") -> DataFrame:
    """R9: deterministic doc-id replay dedup, batch flavour.

    Reference: OpenSearch ``_id = random_id`` (lambda_function.py:81)
    makes redelivered batches idempotent.  Engine-internal equivalent:
    drop duplicate ids within the batch; the streaming flavour is
    ``dropDuplicatesWithinWatermark`` (see streaming.pipeline).
    """
    return df.dropDuplicates([id_col])


# escape-aware JSON string-value pattern (handles \" inside values)
_JSTR = r'"(?:[^"\\]|\\.)*"'


def _strip_json_field(col: Column, field: str, value_pattern: str = _JSTR) -> Column:
    """Textually remove ``"field": <value>`` from a JSON object string,
    keeping the object well-formed (field-with-trailing-comma, then
    comma-preceded-last-field, then lone-field)."""
    f = re.escape(field)
    out = F.regexp_replace(col, f'"{f}"\\s*:\\s*{value_pattern}\\s*,', "")
    out = F.regexp_replace(out, f',\\s*"{f}"\\s*:\\s*{value_pattern}', "")
    return F.regexp_replace(out, f'"{f}"\\s*:\\s*{value_pattern}', "")


def splunk_event_json(df: DataFrame) -> Column:
    """The Splunk-branch event payload: the POST-processed record with
    full schemaless passthrough.

    Reference semantics (lambda_function.py:141,148 + SURVEY §2A fine
    points): Splunk sees the record AFTER ``@timestamp`` derivation and
    empty-``ip`` removal but WITHOUT the ES projection, including any
    unknown fields.  Spark is schema-first, so unknown fields live in
    the raw JSON; the two derived mutations are applied to the raw text
    itself (escape-safe regex + ``to_json`` for quoting), keeping the
    whole path JVM-side:

    - any pre-existing ``@timestamp`` is replaced (dict-assignment
      parity), the new value injected via ``to_json`` so escaping is
      correct;
    - ``"ip": ""`` / ``"ip": null`` is removed (falsy-pop parity).
    """
    raw = _strip_json_field(F.col("_raw"), "@timestamp")
    raw = _strip_json_field(raw, "ip", '(?:""|null)')
    frag = F.to_json(F.struct(F.col("datetime").alias("@timestamp")))
    # '{"@timestamp":"..."}' -> '"@timestamp":"..."'
    ts_pair = F.substring(frag, 2, F.length(frag) - 2)
    injected = F.concat(
        F.lit("{"),
        ts_pair,
        F.when(F.regexp_like(raw, F.lit(r"^\{\s*\}$")), F.lit("")).otherwise(
            F.lit(",")
        ),
        F.substring(raw, 2, F.length(raw) - 1),
    )
    return F.when(F.col("datetime").isNull(), raw).otherwise(injected)


def splunk_envelope(
    df: DataFrame, splunk_index: str, sourcetype: str = "json"
) -> DataFrame:
    """R13: wrap the full record in the Splunk HEC event envelope.

    Reference: lambda_function.py:121-125 —
    ``{"event": message, "sourcetype": "json", "index": splunk_index}``.

    When the frame carries ``_raw`` (schemaless passthrough) the event
    payload is :func:`splunk_event_json` — post-processed raw JSON, so
    unknown fields survive exactly; else the struct of all columns is
    serialized (``to_json`` drops nulls, matching dict-key absence).
    """
    if "_raw" in df.columns and "datetime" in df.columns:
        event = splunk_event_json(df)
    else:
        event = F.to_json(F.struct(*[df[c] for c in df.columns]))
    return df.select(
        event.alias("event"),
        F.lit(sourcetype).alias("sourcetype"),
        F.lit(splunk_index).alias("index"),
    )


def encode_kinesis(df: DataFrame, payload_cols: list[str] | None = None) -> DataFrame:
    """Inverse of :func:`decode_kinesis` — build the Kinesis envelope
    (base64 of a JSON document) from typed columns.

    Used by tests and fixtures to synthesize the stream the reference
    consumes (test_lambda_function.py:64-67 builds the same envelope).
    """
    cols = payload_cols or df.columns
    doc = F.to_json(F.struct(*[df[c] for c in cols]))
    return df.select(F.base64(doc.cast("binary")).alias("kinesis_data"))
