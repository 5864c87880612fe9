from cybervision_tpu.output.writers import output_surface

__all__ = ["output_surface"]
