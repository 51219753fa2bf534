from cleantransformer_tpu.serving.engine import ServingEngine

__all__ = ["ServingEngine"]
