from .necks import GAP, FPN, ChannelMapper, CSPNeXtPAFPN, FeatureMapProcessor, GlobalAveragePooling

__all__ = ["ChannelMapper", "CSPNeXtPAFPN", "FPN", "FeatureMapProcessor", "GAP", "GlobalAveragePooling"]
