"""PySpark-native analytics engine with the capabilities of
source-cooperative/s3-manifest, plus an LLM-training-data operator
surface (dedup, similarity search, text analysis, streaming).

Design stance (see SURVEY.md §7): everything is declared with the
DataFrame / SQL API so Catalyst owns pushdown, pruning, join
selection, and AQE owns runtime re-planning.  Python UDFs appear only
where built-in expressions genuinely cannot express the semantics
(multimodal decode stubs); everything else is JVM-side and
whole-stage-codegen friendly.
"""

from s3_manifest_spark.session import get_spark  # noqa: F401
from s3_manifest_spark.manifest.core import (  # noqa: F401
    MANIFEST_SCHEMA,
    derive_manifest,
    write_manifest,
)

__version__ = "0.1.0"
