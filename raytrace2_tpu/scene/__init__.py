from raytrace2_tpu.scene.loader import load_scene, parse_scene, flatten, SceneError
from raytrace2_tpu.scene.schema import FlatScene, to_device
