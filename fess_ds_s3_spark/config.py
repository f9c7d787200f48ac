"""Crawl configuration.

Mirrors the reference's parameter surface and fail-fast validation:

- parameter names/defaults: ``AmazonS3DataStore.java:75-86,433-502`` (max_keys
  default 1000, max_size default 10_000_000, ignore_error default true,
  supported_mimetypes default ".*", include/exclude patterns, buckets CSV,
  number_of_threads default 1).
- region required / endpoint override: ``AmazonS3Client.java:67-114`` — a
  missing region raises immediately (the reference throws DataStoreException
  in the client ctor, tested at AmazonS3ClientTest.java:112-159).
- the dead ``max_cached_content_size`` knob (AmazonS3Client.java:58,65-72) is
  intentionally NOT implemented (parsed-but-unused in the reference).

Regex semantics: the reference applies Java ``Matcher.matches()`` (full-match)
for both the URL filter (Fess UrlFilter) and the MIME allowlist
(``String::matches``, AmazonS3DataStore.java:217). Spark's ``rlike`` is a
*find*, so every pattern is anchored here, once, as ``^(?:...)$``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Mapping

DEFAULT_MAX_KEYS = 1000  # AmazonS3DataStore.java:75
DEFAULT_MAX_SIZE = 10_000_000  # AmazonS3DataStore.java:76


class ConfigError(ValueError):
    """Fail-fast config validation error (analog of DataStoreException)."""


def _anchor(pattern: str) -> str:
    """Wrap a Java-`matches()`-style pattern for Spark `rlike` full-match."""
    return f"^(?:{pattern})$"


def _split_csv(value: str | None) -> list[str]:
    """Comma-split + trim, dropping empties (AmazonS3DataStore.java:181,471)."""
    if not value:
        return []
    return [part.strip() for part in value.split(",") if part.strip()]


def _parse_int(value: Any, default: int) -> int:
    """Int parse with default-on-error (AmazonS3DataStore.java:448-464)."""
    try:
        return int(str(value))
    except (TypeError, ValueError):
        return default


def _parse_bool(value: Any, default: bool) -> bool:
    if value is None:
        return default
    return str(value).strip().lower() == "true"


@dataclass(frozen=True)
class CrawlConfig:
    """Frozen crawl parameters for one `storeData`-equivalent run."""

    region: str
    endpoint: str | None = None
    # client/session params (S8, AmazonS3Client.java:87-98,166-172):
    access_key_id: str | None = None
    secret_key: str | None = None
    proxy_host: str | None = None
    proxy_port: str | None = None
    buckets: tuple[str, ...] = ()  # empty → all buckets
    max_keys: int = DEFAULT_MAX_KEYS
    max_size: int = DEFAULT_MAX_SIZE
    ignore_error: bool = True
    supported_mimetypes: tuple[str, ...] = (".*",)
    include_pattern: str | None = None
    exclude_pattern: str | None = None
    # X1. Two engine roles, both per the reference's
    # fixedThreadPool(numberOfThreads) intent (AmazonS3DataStore.java:173):
    # (a) parallelism FLOOR for the processing stage (never a cap — a small
    #     value must not force a content shuffle down on a wide cluster;
    #     plans/round.py:process), and
    # (b) upper bound on the per-task GET pool inside the object-store fetch
    #     stage (sources/object_store.fetch_objects), which preserves the
    #     reference's fetch-throttling intent per task. Documented
    #     divergence: on a wide cluster the GLOBAL GET concurrency is
    #     tasks × number_of_threads, not number_of_threads.
    number_of_threads: int = 1
    # Engine-only knobs (no reference analog):
    default_host_budget: int = 1_000_000  # politeness: admissions/host/round
    salt_threshold: int = 100_000  # frontier rows per host before salting
    salt_buckets: int = 8  # salts per hot host
    bloom_expected: int = 10_000_000  # expected distinct URLs per bloom part
    bloom_fpp: float = 0.01
    seen_partitions: int = 64  # bloom blob partitions, parallelism-independent
    respect_robots: bool = False
    user_agent: str = "fess-ds-s3-spark"
    extra: Mapping[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.region:
            # AmazonS3Client.java:75-77 — region is required, fail fast.
            raise ConfigError("Parameter 'region' is required")
        if self.max_keys <= 0:
            raise ConfigError("max_keys must be positive")
        if self.max_size < 0:
            raise ConfigError("max_size must be non-negative")
        # Credentials are required-together (AwsBasicCredentialsProvider,
        # AmazonS3Client.java:166-172: either one empty → DataStoreException;
        # the full both-required check runs at client open, see
        # session.validate_client_params — a config with neither is valid
        # for engine-only use where no store client is opened).
        if bool(self.access_key_id) != bool(self.secret_key):
            raise ConfigError(
                "Parameter 'access_key_id', 'secret_key' is required")
        # Proxy validation (AmazonS3Client.java:87-98): a host without a
        # port fails fast, as does a non-numeric port.
        if self.proxy_host:
            if not self.proxy_port:
                raise ConfigError("proxy_port required.")
            try:
                int(str(self.proxy_port))
            except ValueError as exc:
                raise ConfigError(
                    "parameter 'proxy_port' invalid.") from exc
        if not (0.0 < self.bloom_fpp < 1.0):
            raise ConfigError("bloom_fpp must be in (0, 1)")
        if self.seen_partitions <= 0:
            raise ConfigError("seen_partitions must be positive")
        # Fail fast on broken regexes, like the reference's UrlFilter.init /
        # Pattern.compile at config-build time (AmazonS3DataStore.java:475-495).
        # Python `re` validates the common Java-compatible subset; exotic
        # Java-only syntax (possessive quantifiers) would pass Spark's JVM
        # regex anyway and is not rejected here.
        for name, pattern in (("include_pattern", self.include_pattern),
                              ("exclude_pattern", self.exclude_pattern)):
            if pattern is not None:
                try:
                    re.compile(pattern)
                except re.error as exc:
                    raise ConfigError(f"invalid {name}: {exc}") from exc
        for pattern in self.supported_mimetypes:
            try:
                re.compile(pattern)
            except re.error as exc:
                raise ConfigError(
                    f"invalid supported_mimetypes entry {pattern!r}: {exc}"
                ) from exc

    # ----- reference-param construction ------------------------------------

    @classmethod
    def from_params(cls, params: Mapping[str, Any]) -> "CrawlConfig":
        """Build from a flat string param map, exactly like the reference's
        ``new Config(paramMap)`` (AmazonS3DataStore.java:433-502)."""
        region = str(params.get("region") or "")
        endpoint = params.get("endpoint") or None
        mimes = _split_csv(str(params.get("supported_mimetypes", ".*")))
        return cls(
            region=region,
            endpoint=str(endpoint) if endpoint else None,
            access_key_id=params.get("access_key_id") or None,
            secret_key=params.get("secret_key") or None,
            proxy_host=params.get("proxy_host") or None,
            proxy_port=(str(params["proxy_port"])
                        if params.get("proxy_port") is not None else None),
            buckets=tuple(_split_csv(params.get("buckets"))),
            max_keys=_parse_int(params.get("max_keys"), DEFAULT_MAX_KEYS),
            max_size=_parse_int(params.get("max_size"), DEFAULT_MAX_SIZE),
            ignore_error=_parse_bool(params.get("ignore_error"), True),
            supported_mimetypes=tuple(mimes) or (".*",),
            include_pattern=params.get("include_pattern") or None,
            exclude_pattern=params.get("exclude_pattern") or None,
            number_of_threads=_parse_int(params.get("number_of_threads"), 1),
            default_host_budget=_parse_int(
                params.get("default_host_budget"), 1_000_000
            ),
            respect_robots=_parse_bool(params.get("respect_robots"), False),
        )

    # ----- derived, anchored regexes ----------------------------------------

    @property
    def include_rlike(self) -> str | None:
        return _anchor(self.include_pattern) if self.include_pattern else None

    @property
    def exclude_rlike(self) -> str | None:
        return _anchor(self.exclude_pattern) if self.exclude_pattern else None

    @property
    def mimetypes_rlike(self) -> str:
        """Single anchored alternation over the MIME allowlist (F2)."""
        return _anchor("|".join(f"(?:{p})" for p in self.supported_mimetypes))
