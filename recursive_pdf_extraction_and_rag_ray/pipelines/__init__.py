"""End-to-end pipelines composed from stages. All lazy ray.data.Dataset
plans consumed by ``write_parquet`` — never materialized mid-stream."""
