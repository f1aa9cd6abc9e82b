"""Deterministic in-process stand-in for the vendor REST API.

The container has no network, so the connector is exercised against a pure
function of ``(city_id, offset, limit)`` that reproduces the API's response
shapes (``/root/reference/src/models/response.rs:3-28``,
``src/models/ratings.rs:4-20``) and its edge cases: vendors whose detail
lookup 400s (row degrades to nulls), details missing the ``name`` key
(→ "Unknown"), vendors with 0..N reviews, missing ratings. Stateless and
picklable — executors instantiate it freely.
"""

from __future__ import annotations

import json


class FakeVendorBackend:
    """Deterministic fake of the listing + lookup endpoints."""

    def n_vendors(self, city_id: str) -> int:
        return 97 + (sum(ord(c) for c in city_id) * 31) % 120

    def _codes(self, city_id: str) -> list[str]:
        return [f"c{city_id}-v{i:05d}" for i in range(self.n_vendors(city_id))]

    def list_page(self, city_id: str, offset: int, limit: int) -> dict:
        """≡ GET /vendors?city=..&offset=..&limit=..
        (``src/services/api.rs:23-69``)."""
        codes = self._codes(city_id)
        page = codes[offset : offset + limit]
        return {
            "data": {
                "items": [{"code": c} for c in page],
                "returned_count": len(page),
                "available_count": len(codes),
            }
        }

    @staticmethod
    def _idx(code: str) -> int:
        return int(code.rsplit("v", 1)[1])

    def details(self, code: str) -> str | None:
        """≡ detail lookup; every 23rd vendor 400s → ``None``
        (``src/services/api.rs:104-134``)."""
        i = self._idx(code)
        if i % 23 == 11:
            return None
        d: dict = {"cuisine": ["bbq", "thai", "pizza", "sushi"][i % 4], "idx": i}
        if i % 17 != 3:  # some details lack the name key → "Unknown"
            d["name"] = f"Vendor {code}"
        return json.dumps(d, sort_keys=True)

    def reviews(self, code: str) -> list[tuple[str, int]]:
        """≡ newest-30 reviews lookup, (review_json, created_at) pairs
        (``src/services/api.rs:188-223``)."""
        i = self._idx(code)
        n = i % 5
        return [
            (json.dumps({"score": (i + k) % 5 + 1, "k": k}, sort_keys=True), 1_000_000 + i * 10 + k)
            for k in range(n)
        ]

    def ratings(self, code: str) -> str | None:
        """≡ ratings-distribution lookup (``src/services/api.rs:152-186``)."""
        i = self._idx(code)
        if i % 13 == 5:
            return None
        return json.dumps(
            {
                "total_count": i % 50,
                "ratings": [
                    {"count": i % 10, "percentage": 100, "score": 5},
                ],
            },
            sort_keys=True,
        )
