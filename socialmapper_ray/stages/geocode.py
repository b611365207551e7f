"""Address geocoding stage (reference S7 + ST4): provider chain + cache.

Reference: AddressGeocodingEngine with a Nominatim -> Census fallback
chain (geocoding/engine.py:52-175, providers ABC
geocoding/providers.py:22-60) and a JSON file cache
(geocoding/cache.py:19-118). No network exists in this sandbox, so
providers are deterministic stand-ins; what is REAL is the engine
shape the reference defines:

- provider ABC + ordered fallback (first success wins),
- an actor-local cache so repeated addresses hit memory (the ST4 cache
  moved from a JSON file into actor state — per the SURVEY §2.3
  mapping),
- actor-pool ``map_batches`` so cache + providers are built once per
  actor.

``HashGeocoder`` derives coordinates from a hash of the normalized
address (pure, deterministic); ``FlakyGeocoder`` fails a deterministic
subset to exercise the fallback path (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources.synth import LAT_MAX, LAT_MIN, LON_MAX, LON_MIN, splitmix64


class GeocodeProvider:
    """Provider ABC (reference geocoding/providers.py:22-60)."""

    name = "base"

    def geocode(self, address: str):
        """-> (lat, lon) or None when this provider cannot resolve."""
        raise NotImplementedError


def _addr_key(address: str) -> np.uint64:
    import zlib

    norm = " ".join(address.strip().lower().split())
    return np.uint64(zlib.crc32(norm.encode("utf-8")))


class HashGeocoder(GeocodeProvider):
    """Always-succeeds deterministic provider (coordinates from a hash
    of the normalized address)."""

    name = "hash"

    def geocode(self, address: str):
        h = splitmix64(_addr_key(address))
        u1 = float((h >> np.uint64(11)).astype(np.float64) / (1 << 53))
        h2 = splitmix64(h)
        u2 = float((h2 >> np.uint64(11)).astype(np.float64) / (1 << 53))
        return (LAT_MIN + u1 * (LAT_MAX - LAT_MIN),
                LON_MIN + u2 * (LON_MAX - LON_MIN))


class GazetteerGeocoder(GeocodeProvider):
    """Reference-database provider: resolves names against a broadcast
    gazetteer (sorted name array + coordinates, ``ray.put`` once, read
    per actor). This is the offline analogue of the reference's primary
    provider hitting a geocoding database (geocoding/providers.py:22-60)
    — the lookup itself is a binary search, the dataset side streams,
    and misses fall through to the next provider in the chain."""

    name = "gazetteer"

    def __init__(self, gazetteer_ref):
        self.ref = gazetteer_ref
        self._names = None

    def _ensure(self):
        if self._names is None:
            import ray

            self._names, self._lat, self._lon = ray.get(self.ref)

    def geocode(self, address: str):
        self._ensure()
        i = int(np.searchsorted(self._names, address))
        if i < len(self._names) and self._names[i] == address:
            return float(self._lat[i]), float(self._lon[i])
        return None


class FlakyGeocoder(GeocodeProvider):
    """Fails on a deterministic subset of addresses (fallback exercise)."""

    name = "flaky"

    def __init__(self, fail_mod: int = 3):
        self.fail_mod = fail_mod

    def geocode(self, address: str):
        if int(_addr_key(address)) % self.fail_mod == 0:
            return None
        h = splitmix64(_addr_key(address) ^ np.uint64(0xF1A7))
        u1 = float((h >> np.uint64(11)).astype(np.float64) / (1 << 53))
        return (LAT_MIN + u1 * (LAT_MAX - LAT_MIN), LON_MIN + 1.0)


class GeocodeEngine:
    """Actor-pool stage: ordered provider fallback + actor-local cache."""

    def __init__(self, providers=None, address_col: str = "address"):
        self.providers = providers if providers is not None else \
            [FlakyGeocoder(), HashGeocoder()]
        self.address_col = address_col
        self.cache: dict[str, tuple] = {}
        self.stats = {"hits": 0, "misses": 0}

    def _lookup(self, address: str):
        if address in self.cache:
            self.stats["hits"] += 1
            return self.cache[address]
        self.stats["misses"] += 1
        for p in self.providers:
            res = p.geocode(address)
            if res is not None:
                out = (res[0], res[1], p.name)
                self.cache[address] = out
                return out
        out = (np.nan, np.nan, "none")
        self.cache[address] = out
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        res = [self._lookup(a) for a in df[self.address_col]]
        out = df.copy()
        out["lat"] = [r[0] for r in res]
        out["lon"] = [r[1] for r in res]
        out["provider"] = [r[2] for r in res]
        return out


def geocode_addresses(ds, address_col: str = "address", providers=None,
                      concurrency=2, batch_size: int = 2048):
    from ..util import clamp_concurrency

    concurrency = clamp_concurrency(concurrency, 0.5)
    return ds.map_batches(
        GeocodeEngine,
        fn_constructor_kwargs=dict(address_col=address_col,
                                   providers=providers),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5)
