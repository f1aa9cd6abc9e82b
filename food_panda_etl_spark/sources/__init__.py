"""Ingestion connectors (SURVEY.md §2.1 S1-S4, §7 step 10).

The only reference capability with no Spark built-in: a rate-limited,
paginated REST listing scan plus per-key enrichment lookups. Isolated here
so the analytic engine never depends on ingestion.
"""

from food_panda_etl_spark.sources.fake_backend import FakeVendorBackend
from food_panda_etl_spark.sources.rest import (
    VendorListDataSource,
    lookup_vendor_payloads,
    register_vendor_list_source,
    split_payloads,
)
from food_panda_etl_spark.sources.retry import retry_with_backoff

__all__ = [
    "FakeVendorBackend",
    "VendorListDataSource",
    "lookup_vendor_payloads",
    "register_vendor_list_source",
    "retry_with_backoff",
    "split_payloads",
]
