"""Splunk-HEC-shaped sink (reference splunk_handler + _send_to_splunk,
lambda_function.py:90-138).

Semantics preserved:

- full (unprojected) record, schemaless passthrough
  (lambda_function.py:148 — the Splunk branch sees every field);
- HEC envelope ``{"event": ..., "sourcetype": "json", "index": ...}``
  (:121-125);
- 500-event chunks, remainder flushed (:115,127-135);
- per-POST failure swallowed → that chunk counts 0, stream continues
  (:100-102) — expressed as ``max_retries=0`` + containment;
- ``disabled`` gate: bool True or case-insensitive string "true"
  skips the sink entirely (:106-108).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pipeline import splunk_envelope
from .base import ChunkedTransportSink


def is_disabled(flag: object) -> bool:
    """The reference's exact gate: truthy AND str(...).lower()=="true"
    (lambda_function.py:106-108; string "false" is truthy but fails the
    equality, i.e. enabled)."""
    return bool(flag) and str(flag).lower() == "true"


@dataclass
class SplunkHECSink(ChunkedTransportSink):
    name: str = "splunk"
    splunk_index: str = "main"
    disabled: object = None
    max_retries: int = 0  # one attempt per POST, failure -> 0 (:100-102)

    def serialize(self, df: DataFrame) -> DataFrame:
        env = splunk_envelope(df, self.splunk_index)
        # The reference posts ``event`` as a *nested JSON object*
        # (requests.post(json=events), lambda_function.py:97,121-125).
        # env["event"] is already rendered JSON text, so splice it into
        # the envelope verbatim instead of re-serializing it as a string
        # field (to_json(struct(event,...)) would JSON-escape it into
        # {"event": "{\"...\"}"}).  sourcetype/index go through to_json
        # for proper quoting.
        rest = F.to_json(F.struct(env["sourcetype"], env["index"]))
        payload = F.concat(
            F.lit('{"event":'),
            env["event"],
            F.lit(","),
            F.substring(rest, 2, 1 << 30),  # drop rest's leading '{'
        )
        # None-guard parity (lambda_function.py:117-119): a record whose
        # parse produced no event is skipped, not posted as null.
        return env.filter(env["event"].isNotNull()).select(
            payload.alias("payload")
        )

    def write(self, df: DataFrame) -> tuple[int, int]:
        if is_disabled(self.disabled):
            self.last_success, self.last_total = 0, 0
            print("Splunk logging is disabled")  # lambda_function.py:107
            return 0, 0
        return super().write(df)
