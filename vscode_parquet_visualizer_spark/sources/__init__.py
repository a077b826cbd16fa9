"""Source readers: extension→format routing, Parquet/CSV/Avro/JSON, s3a."""
