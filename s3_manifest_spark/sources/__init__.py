from s3_manifest_spark.sources.tables import load_table, synth_listing, SYNTH_LISTING_SQL  # noqa: F401
