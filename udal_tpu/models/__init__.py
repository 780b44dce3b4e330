"""Model family: EfficientNet backbones, BiFPN, heads, EfficientDet."""
