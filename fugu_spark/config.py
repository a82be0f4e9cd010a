"""Engine configuration source (SURVEY.md §2 S6).

The reference loads a ServerConfig from a YAML or JSON file chosen by
extension (``DatasetManager::from_config_file``,
/root/reference/src/db/config.rs:113-141) and falls back to environment
variables when no file is given (``FUGU_DATA_PATH`` /
``FUGU_DEFAULT_NAMESPACE``, /root/reference/src/main.rs:115-129). This
module reproduces that resolution order for the Spark engine's
parameters so they can be set at ``spark-submit`` time without touching
code:

    resolution: defaults  <  config file  <  FUGU_SPARK_* env vars

File IO goes through :mod:`fugu_spark.fsio`, so ``--config
s3a://bucket/fugu.yaml`` works on a cluster.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, fields

from . import BM25_B, BM25_K1
from . import fsio
from .dataset import MAX_TEXT_LEN
from .tokenizer import DEFAULT_MODE

ENV_PREFIX = "FUGU_SPARK_"


@dataclass
class EngineConfig:
    """Every tunable the engine exposes, with the round-1 defaults."""

    index_dir: str | None = None
    default_namespace: str = "fugu_db"  # main.rs:121 default
    id_col: str = "doc_id"
    text_col: str = "content"
    mode: str = DEFAULT_MODE
    n_buckets: int = 32
    hot_df_threshold: int = 250_000
    max_text_len: int = MAX_TEXT_LEN
    strict_validation: bool = False
    k1: float = BM25_K1
    b: float = BM25_B
    serve_max_postings: int = 5_000_000

    @classmethod
    def from_file(cls, path: str) -> "EngineConfig":
        """YAML for .yaml/.yml (the reference's serde_yaml branch), JSON
        otherwise — unknown keys rejected loudly, like serde's default."""
        text = fsio.read_text(path)
        if path.endswith((".yaml", ".yml")):
            import yaml

            raw = yaml.safe_load(text) or {}
        else:
            raw = json.loads(text)
        known = {f.name for f in fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
        return cls(**raw)

    def with_env_overrides(self, environ: dict[str, str] | None = None) -> "EngineConfig":
        """FUGU_SPARK_<UPPER_FIELD>=value overrides, type-coerced."""
        env = os.environ if environ is None else environ
        out = EngineConfig(**{f.name: getattr(self, f.name) for f in fields(self)})
        for f in fields(self):
            key = ENV_PREFIX + f.name.upper()
            if key not in env:
                continue
            raw = env[key]
            cur = getattr(out, f.name)
            if isinstance(cur, bool):
                val: object = raw.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                val = int(raw)
            elif isinstance(cur, float):
                val = float(raw)
            else:
                val = raw
            setattr(out, f.name, val)
        return out


def load_config(
    path: str | None = None, environ: dict[str, str] | None = None
) -> EngineConfig:
    """The reference's resolution order: file if given (or pointed at by
    FUGU_SPARK_CONFIG), then env overrides on top, else pure env/defaults."""
    env = os.environ if environ is None else environ
    path = path or env.get(ENV_PREFIX + "CONFIG")
    base = EngineConfig.from_file(path) if path else EngineConfig()
    return base.with_env_overrides(env)
