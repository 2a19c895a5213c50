"""PySpark-native waterway-network & spatial-tiling engine.

A from-scratch, Spark-first re-expression of the capabilities of
``DanielHSMartin/OSMWaterWayExtractor`` (reference at /root/reference,
``osm_waterway_extractor.py``): OSM node/way records arrive as spans inside
interleaved documents ``(doc_id, spans)``, are parsed with vectorized
Arrow/pandas UDFs, assembled into a node-edge waterway graph via salted hash
joins, tiled with an H3-calibrated hierarchical grid, and rolled up / clipped /
kNN-snapped — all as DataFrame dataflow that Catalyst + AQE can optimize.

Layout
------
- ``functions/``  pure NumPy kernels (shared by Spark UDFs AND the single
  process test oracle, guaranteeing bit-parity) + Catalyst column builders.
- ``sources/``    interleaved-doc generator and the span parser.
- ``operators/``  the dataflow operators from SURVEY.md §2.
- ``plans/``      end-to-end pipeline + checkpoint/lineage/resume.
- ``sinks/``      parquet/csv/geojson/jsongz/mobile writers + manifest.
- ``oracle.py``   single-process reference implementation (the golden spec).
"""

__version__ = "0.1.0"

from .config import EngineConfig  # noqa: F401
