"""socialmapper_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-creation of the query/transform semantics of
mihiarc/socialmapper (reference at /root/reference, v0.6.1) as a
distributed engine over Common-Crawl-style web-page Parquet
(url, warc_ts, html, text, lang), built Ray-Data-first:

- every per-record transform is a vectorized ``map_batches`` over
  zero-copy Arrow batches,
- stateful stages (spatial indexes, routing tables) are actor pools
  with state built once per actor in ``__init__``,
- wide steps use ``groupby/aggregate/sort`` with explicit keys,
- small sides are broadcast once via ``ray.put``.

No geospatial third-party deps: tiling (S2-style quadcells, H3-style
hexcells), geometry (WKB, point-in-polygon, hulls) are implemented in
numpy in :mod:`socialmapper_ray.tiles` / :mod:`socialmapper_ray.geom`.

Library code never calls ``ray.init`` / ``ray.shutdown`` (driver
contract, see /root/repo/__ray_entry__.py).
"""

__version__ = "0.1.0"
