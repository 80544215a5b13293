"""Sources: the feature table (tank's single storage table re-expressed as a
DataFrame), the driver's TPC-H-ish parquet tables, and streaming ingest.
"""
