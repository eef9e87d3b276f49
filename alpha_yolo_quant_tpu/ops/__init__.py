"""Integer-exact compute primitives for the TPU quantized runtime."""
