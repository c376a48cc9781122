"""Device-side ops: geometry, warps, decode, OKS/NMS, correlation, heatmaps."""
