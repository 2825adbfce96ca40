"""Optional live network transports behind the :class:`~.base.Transport`
protocol.

These are the production bindings of the reference's two delivery paths
— ``requests.post`` to a Splunk HEC endpoint (lambda_function.py:92-99)
and ``opensearchpy.helpers.bulk`` (lambda_function.py:68-84) — kept OUT
of every engine pipeline and test-fixture default: CI and the driver
exercise :class:`~.base.SpoolDirTransport`, which reproduces the same
retry/chunk/containment contract hermetically.  A deployment plugs one
of these in via ``ChunkedTransportSink(transport_factory=...)``; the
factory runs on the EXECUTOR inside ``foreachPartition``, so the HTTP
session / client is created per partition and nothing network-ish is
serialized from the driver.

Retry and containment stay in :class:`~.base.ChunkedTransportSink`
(bounded retries, logged-not-raised) — a transport only has to deliver
one chunk or raise :class:`~.base.TransportError`.
"""

from __future__ import annotations

from .base import TransportError


class RequestsTransport:
    """HTTP POST transport with the reference's Splunk-HEC contract
    (lambda_function.py:92-99): one POST per chunk, body = JSON array
    of the chunk's event objects (``requests.post(json=events)``
    serialization), ``Authorization: Splunk <token>`` header, and a
    12-second timeout.  Any exception or non-2xx response raises
    :class:`TransportError` — the sink's containment turns that into
    the reference's "failed POST counts 0, stream continues"
    (:100-102) when ``max_retries=0`` (SplunkHECSink's default).

    The chunk's payload strings are already-rendered JSON objects, so
    the array body is spliced textually — byte-identical to what
    ``requests`` would produce from the parsed list, without a
    parse/re-serialize round trip.
    """

    def __init__(
        self,
        url: str,
        token: str | None = None,
        timeout: float = 12,  # lambda_function.py:97
        verify: bool = True,
    ) -> None:
        import requests  # optional-dependency gate: import at construction

        self._requests = requests
        self._session = requests.Session()
        self.url = url
        self.token = token
        self.timeout = timeout
        self.verify = verify

    def send(self, chunk: list[str]) -> None:
        headers = {"Content-Type": "application/json"}
        if self.token is not None:
            headers["Authorization"] = f"Splunk {self.token}"  # :95
        body = ("[" + ",".join(chunk) + "]").encode()
        try:
            resp = self._session.post(
                self.url,
                data=body,
                headers=headers,
                timeout=self.timeout,
                verify=self.verify,
            )
            resp.raise_for_status()  # :98
        except Exception as exc:
            raise TransportError(f"POST {self.url} failed: {exc}") from exc


def http_auth_for(
    config,  # noqa: ANN001 - EngineConfig (kept untyped to avoid an import cycle)
    credentials: object = None,
    region: str | None = None,
) -> object:
    """The reference's auth-mode branch (lambda_function.py:61-66) as a
    transport-level binding: when the secret carried master credentials
    (``config.auth_mode == "basic"``) return the ``(user, password)``
    tuple the reference builds at :62-63; otherwise build an
    ``AWSV4SignerAuth`` from the ambient session credentials exactly as
    :64-66 does.  The SigV4 leg is import-gated on ``opensearch-py``
    (the package that ships the signer — absent from CI images, where
    construction raises ImportError; the basic leg needs no package at
    all).  ``credentials``/``region`` are injected, not discovered: the
    engine has no boto3 dependency, so the caller supplies whatever its
    runtime's credential provider produced.
    """
    if config.auth_mode == "basic":
        return (config.auth_user, config.auth_password)  # :62-63
    from opensearchpy import AWSV4SignerAuth  # optional-dependency gate

    if credentials is None or region is None:
        raise ValueError(
            "sigv4 auth mode needs ambient credentials and a region "
            "(the reference reads them from its boto3 session, :64-65)"
        )
    return AWSV4SignerAuth(credentials, region)  # :66


class OpenSearchBulkTransport:
    """``opensearchpy`` bulk transport (lambda_function.py:68-84):
    client configured like the reference (port 443, http_compress,
    TLS + cert verification), one ``helpers.bulk`` call per chunk.

    Chunk payloads are the sink's serialized actions
    (``{"_index":…,"_id":…,"_source":…}`` — sinks/opensearch.py), which
    is exactly ``helpers.bulk``'s action format, so delivery is a JSON
    parse + bulk call.  The reference passes ``max_retries=3`` to
    ``helpers.bulk``; here retries live in ChunkedTransportSink
    (max_retries=3 default) so ``helpers.bulk`` runs single-shot and
    ``raise_on_error=False`` parity is the sink's containment.  Partial
    per-item errors raise :class:`TransportError` so the chunk retries
    as a unit (bulk indexing with deterministic ``_id`` is idempotent —
    R9 — so re-sending a half-applied chunk is safe).

    Requires the ``opensearch-py`` package (absent from CI images —
    construction raises ImportError there, and nothing in the engine
    constructs it by default).
    """

    def __init__(
        self,
        host: str,
        port: int = 443,  # lambda_function.py:70
        http_auth: object = None,
        use_ssl: bool = True,
        verify_certs: bool = True,
        http_compress: bool = True,
    ) -> None:
        from opensearchpy import OpenSearch, helpers  # optional-dependency gate

        self._helpers = helpers
        self._client = OpenSearch(
            hosts=[{"host": host, "port": port}],
            http_auth=http_auth,
            http_compress=http_compress,
            use_ssl=use_ssl,
            verify_certs=verify_certs,
        )

    @classmethod
    def from_config(
        cls,
        config,  # noqa: ANN001 - EngineConfig
        credentials: object = None,
        region: str | None = None,
    ) -> "OpenSearchBulkTransport":
        """Reference client assembly (lambda_function.py:56-74): host
        from ``config.es_endpoint``, auth resolved through the
        basic-vs-SigV4 branch (:61-66, :func:`http_auth_for`)."""
        return cls(
            host=config.es_endpoint,
            http_auth=http_auth_for(config, credentials, region),
        )

    def send(self, chunk: list[str]) -> None:
        import json

        actions = [json.loads(line) for line in chunk]
        try:
            success, errors = self._helpers.bulk(
                self._client, actions, raise_on_error=False
            )
        except Exception as exc:
            raise TransportError(f"bulk delivery failed: {exc}") from exc
        if errors:
            raise TransportError(f"bulk rejected {len(errors)} items: {errors[:3]}")
