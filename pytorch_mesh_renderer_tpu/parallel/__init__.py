"""Multi-chip scale-out: device meshes, sharded rendering, psum training."""
