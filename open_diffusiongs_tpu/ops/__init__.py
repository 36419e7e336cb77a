"""TPU-native compute ops: cameras, rays, Gaussian-splatting math, rasterizers."""
