"""Flax modules: backbone, decoder, heads, DINO ViT, correspondence, MeshNet."""
