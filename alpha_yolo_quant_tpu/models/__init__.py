"""Model definitions: the declarative YOLOv8 graph IR, float forward,
checkpoint loading and BatchNorm fusion."""
