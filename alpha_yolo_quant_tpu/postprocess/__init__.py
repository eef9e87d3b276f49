"""Detection post-processing: confidence filtering, NMS (float and integer
q_NMS), box rescaling."""
