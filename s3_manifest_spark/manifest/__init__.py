from s3_manifest_spark.manifest.core import (  # noqa: F401
    MANIFEST_SCHEMA,
    derive_manifest,
    write_manifest,
)
