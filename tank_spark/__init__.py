"""tank_spark — a PySpark-native analytics engine with the query surface of
aperture-sh/tank (a geospatial feature store serving vector tiles and
heatmaps), extended with large-scale data-pipeline operators (dedup,
similarity search, text analysis, streaming).

Architecture: everything is declarative DataFrame/SQL so Catalyst handles
pruning/pushdown/join strategy; the only Python-side kernels are the
Arrow-vectorized tile geometry stages (clip/transform/MVT encode) that SQL
cannot express.
"""

__version__ = "0.1.0"
