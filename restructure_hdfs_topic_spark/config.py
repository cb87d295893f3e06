"""Configuration system (SURVEY O30; reference config/RestructureConfig.kt).

Same shape as the reference: YAML file + environment-variable overrides +
per-topic overrides (exclude, excludeFromDelete, dedup key fields).  Plain
dataclasses — no external deps beyond PyYAML (gated import; dict-config
works without it).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class TopicConfig:
    """Per-topic overrides (RestructureConfig.kt:233-265)."""

    exclude: bool = False
    exclude_from_delete: bool = False
    dedup_enable: bool | None = None
    dedup_distinct_fields: list[str] = field(default_factory=list)
    dedup_ignore_fields: list[str] = field(default_factory=list)


@dataclass
class WorkerConfig:
    """Worker knobs (RestructureConfig.kt:147-174).  num_threads maps to
    Spark parallelism (informational); cache knobs are superseded by the
    partitioned writer but kept for config compatibility."""

    num_threads: int = 1
    cache_size: int = 100
    cache_offsets_size: int = 500_000
    max_files_per_topic: int | None = None
    minimum_file_age_s: int = 60


@dataclass
class CleanerConfig:
    """Cleaner knobs (RestructureConfig.kt:134-146)."""

    enable: bool = False
    interval_s: int = 1260
    age_days: int = 7


@dataclass
class ServiceConfig:
    """Service mode (RestructureConfig.kt:121-129)."""

    enable: bool = False
    interval_s: int = 300


@dataclass
class PathConfig:
    """Path template (FormattedPathFactory.kt:31-111)."""

    template: str = "${projectId}/${userId}/${topic}/${filename}"
    bin_format: str = "yyyyMMdd_HH'00'"
    # "hive" (partition-column tree, Spark-native pushdown) or "template"
    # (the reference's exact physical tree via plans.layout finalize).
    layout: str = "hive"


@dataclass
class TargetConfig:
    """Local-target ownership (config LocalConfig: userId/groupId, applied by
    target/LocalTargetStorage.kt:68-75; -1 = leave as-is).  Only meaningful
    for local filesystem targets."""

    local_user_id: int = -1
    local_group_id: int = -1
    # Apply the reference's stored-file modes (0644/0755) + uid/gid as a
    # post-write pass over local targets.  Off by default: the Hive-layout
    # tree is normally consumed by Spark itself, where umask perms are fine.
    apply_local_attrs: bool = False


@dataclass
class RestructureConfig:
    source_dir: str = ""
    target_dir: str = ""
    state_dir: str = ""
    format: str = "json"  # csv | json
    compression: str | None = None  # gzip | None
    # O19: storage-based topic leases for multi-app deployments (the
    # reference's RedisRemoteLockManager semantics over the state dir).
    # Default off: a single Spark app owns the whole plan.
    lock_enable: bool = False
    dedup_enable: bool = False
    dedup_distinct_fields: list[str] = field(default_factory=list)
    dedup_ignore_fields: list[str] = field(default_factory=list)
    worker: WorkerConfig = field(default_factory=WorkerConfig)
    cleaner: CleanerConfig = field(default_factory=CleanerConfig)
    service: ServiceConfig = field(default_factory=ServiceConfig)
    paths: PathConfig = field(default_factory=PathConfig)
    target: TargetConfig = field(default_factory=TargetConfig)
    topics: dict[str, TopicConfig] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "RestructureConfig":
        cfg = cls()
        for k in (
            "source_dir",
            "target_dir",
            "state_dir",
            "format",
            "compression",
            "dedup_enable",
            "lock_enable",
            # Global dedup-key config (RestructureConfig.kt:248-265);
            # dropping these silently turned subset-key dedup into
            # full-row dedup.
            "dedup_distinct_fields",
            "dedup_ignore_fields",
        ):
            if k in d:
                setattr(cfg, k, d[k])
        for section, typ in (
            ("worker", WorkerConfig),
            ("cleaner", CleanerConfig),
            ("service", ServiceConfig),
            ("paths", PathConfig),
            ("target", TargetConfig),
        ):
            if section in d:
                setattr(cfg, section, typ(**d[section]))
        for topic, td in (d.get("topics") or {}).items():
            cfg.topics[topic] = TopicConfig(**td)
        return cfg

    @classmethod
    def load(cls, path: str | None = None) -> "RestructureConfig":
        """YAML load (gated) + env overrides, mirroring
        RestructureConfig.load(...).withEnv() (RestructureConfig.kt:80-84)."""
        d: dict = {}
        if path and os.path.exists(path):
            try:
                import yaml

                with open(path) as fh:
                    d = yaml.safe_load(fh) or {}
            except ImportError:
                raise RuntimeError("PyYAML unavailable; pass a dict to from_dict()")
        cfg = cls.from_dict(d)
        return cfg.with_env()

    def with_env(self) -> "RestructureConfig":
        """Env-var overrides (RestructureConfig.kt:349-390 pattern)."""
        self.source_dir = os.environ.get("RESTRUCTURE_SOURCE_DIR", self.source_dir)
        self.target_dir = os.environ.get("RESTRUCTURE_TARGET_DIR", self.target_dir)
        self.state_dir = os.environ.get("RESTRUCTURE_STATE_DIR", self.state_dir)
        return self

    def topic(self, name: str) -> TopicConfig:
        return self.topics.get(name, TopicConfig())

    def dedup_key_for(
        self,
        name: str,
        all_columns: list[str],
        default_exclude: frozenset[str] | set[str] = frozenset(),
    ) -> list[str] | None:
        """Resolve the dedup key set for a topic: distinctFields subset, or
        all minus ignoreFields, or None when dedup is off
        (CsvAvroConverterFactory.kt:158-171).

        ``default_exclude`` (per-record accounting columns like ``offset``)
        is subtracted ONLY on the default full-row path: explicitly
        configured distinct fields are honored verbatim, so a config naming
        ``["time", "user_id"]`` keys on both instead of being silently
        narrowed.
        """
        tc = self.topic(name)
        enabled = tc.dedup_enable if tc.dedup_enable is not None else self.dedup_enable
        if not enabled:
            return None
        distinct = tc.dedup_distinct_fields or self.dedup_distinct_fields
        ignore = tc.dedup_ignore_fields or self.dedup_ignore_fields
        if distinct:
            key = [c for c in all_columns if c in distinct]
            if not key:
                # An empty key would be reinterpreted downstream as
                # full-row dedup (keep_last_dedup's [] sentinel) — a typo'd
                # field name must fail loudly, not silently change
                # semantics.
                raise ValueError(
                    f"dedup_distinct_fields {distinct} match no columns of "
                    f"topic {name!r} (columns: {all_columns})"
                )
            return key
        return [
            c for c in all_columns if c not in ignore and c not in default_exclude
        ]
