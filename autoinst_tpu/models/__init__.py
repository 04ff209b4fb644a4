"""Neural models (JAX/Flax): MaskPLS refiner, TARL and DINOv2 extractors."""
