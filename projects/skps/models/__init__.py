from .skps_head import SKPSHead, skps_device_predict, skps_loss  # noqa: F401
