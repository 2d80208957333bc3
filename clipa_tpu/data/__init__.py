"""Data layer: TFRecord IO, data sources, host input pipeline."""

from clipa_tpu.data.core import DataSource, get_source  # noqa: F401
