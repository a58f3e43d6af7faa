"""tafra_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of petbox-dev/tafra (see SURVEY.md).

Architecture: a ``Tafra`` facade over ``pyspark.sql.DataFrame`` — every
reference operator re-expressed as a declarative Catalyst plan — plus
scale extensions for LLM-data-pipeline work (dedup, similarity search,
text analysis, multimodal columns, streaming).
"""

from .core import Tafra, GroupDescription
from .formatter import ObjectFormatter, object_formatter
from .session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = [
    "Tafra",
    "GroupDescription",
    "ObjectFormatter",
    "object_formatter",
    "get_spark",
    "stop_spark",
    "__version__",
]
