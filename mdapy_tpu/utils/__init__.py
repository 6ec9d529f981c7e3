"""Utility layer: PKA setup, velocities, file splitting/compression,
potential-development tooling (PCA/FPS/EOS/SFE/format converters), plotting
defaults."""
