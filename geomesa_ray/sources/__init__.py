from geomesa_ray.sources.synth import synthesize_corpus, corpus_path

__all__ = ["synthesize_corpus", "corpus_path"]
