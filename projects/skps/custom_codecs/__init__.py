from .skps_heatmap import SKPSHeatmap  # noqa: F401
