"""Job configuration — the reference's Settings universe
(``/root/reference/src/config.rs:6-54``: YAML file + ``APP_``-prefixed
environment overlay) as typed dataclasses, bridged onto Spark conf.

The reference feeds MinIO settings into a bespoke S3 client
(``src/storage/minio.rs:17-75``); here they become ``spark.hadoop.fs.s3a.*``
settings (see ``sinks.s3a_conf``) so the engine's writers inherit them with
no custom client code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from food_panda_etl_spark.sinks import s3a_conf

ENV_PREFIX = "APP"  # config::Environment::with_prefix("APP"), config.rs:31


@dataclass
class MinioConfig:
    endpoint: str = ""
    access_key: str = ""
    secret_key: str = ""
    bucket: str = ""
    region: str = ""


@dataclass
class ApiConfig:
    headers: dict[str, str] = field(default_factory=dict)


@dataclass
class Settings:
    cities: list[str] = field(default_factory=list)
    minio: MinioConfig = field(default_factory=MinioConfig)
    api: ApiConfig = field(default_factory=ApiConfig)

    @classmethod
    def load(cls, path: str | None = None, env: dict[str, str] | None = None) -> Settings:
        """YAML file + environment overlay, reference precedence: env wins
        (``config.rs:29-31``). Env keys are ``APP_<SECTION>__<FIELD>``
        (double underscore as the nesting separator, e.g.
        ``APP_MINIO__ENDPOINT``); ``APP_CITIES`` is comma-separated."""
        raw: dict = {}
        if path:
            import yaml

            with open(path) as f:
                raw = yaml.safe_load(f) or {}
        env = dict(os.environ if env is None else env)

        def over(section: str, fld: str, current: str) -> str:
            return env.get(f"{ENV_PREFIX}_{section}__{fld}".upper(), current)

        m = raw.get("minio", {}) or {}
        minio = MinioConfig(
            endpoint=over("minio", "endpoint", m.get("endpoint", "")),
            access_key=over("minio", "access_key", m.get("access_key", "")),
            secret_key=over("minio", "secret_key", m.get("secret_key", "")),
            bucket=over("minio", "bucket", m.get("bucket", "")),
            region=over("minio", "region", m.get("region", "")),
        )
        cities_env = env.get(f"{ENV_PREFIX}_CITIES")
        cities = (
            [c for c in cities_env.split(",") if c]
            if cities_env
            else [str(c) for c in raw.get("cities", [])]
        )
        headers = {str(k): str(v) for k, v in (raw.get("api", {}) or {}).get("headers", {}).items()}
        return cls(cities=cities, minio=minio, api=ApiConfig(headers=headers))

    def spark_conf(self) -> dict[str, str]:
        """The Spark-side projection of these settings: S3A credentials/
        endpoint for the partitioned sink (``s3a://<bucket>/...`` paths)."""
        if not self.minio.endpoint:
            return {}
        conf = s3a_conf(
            self.minio.endpoint, self.minio.access_key, self.minio.secret_key
        )
        if self.minio.region:
            conf["spark.hadoop.fs.s3a.endpoint.region"] = self.minio.region
        return conf

    def sink_base_path(self) -> str:
        return f"s3a://{self.minio.bucket}"
