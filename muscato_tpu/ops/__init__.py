"""Device building blocks: window packing, probing, verification."""
