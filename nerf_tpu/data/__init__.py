from .blender import BlenderDataset, DynamicDataset, sample_random_rays
from .synthetic import make_synthetic_blender_scene, make_gradient_image
