from geomesa_ray.state.manifest import Manifest, run_resumable

__all__ = ["Manifest", "run_resumable"]
