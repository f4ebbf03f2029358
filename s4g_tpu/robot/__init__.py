from .grasp_client import GraspClient, HAND_TO_EE, EE_TO_HAND
from .vision_client import VisionClient
