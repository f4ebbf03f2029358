"""Real-robot camera/table calibration constants.

Mirrors the reference's hardware-setup module (reference:
inference/grasp_proposal/configs/real_world_config.py:9-33).  The extrinsics
are the published example values; adapt per deployment.
"""

import numpy as np

# (length, width) of the table; consistent with camera2table.
table_size = ()

# Maximum expected clutter height above the table plane.
max_height = 0.4

# Camera frame -> table-center frame.  x-axis = table length direction.
camera2table = np.array([[-0.00377177, 0.54720216, -0.83699198, 0.766],
                         [0.99981506, -0.01372054, -0.01347562, -0.276],
                         [-0.01885787, -0.83688801, -0.54704921, 0.62],
                         [0., 0., 0., 1.]])

camera2base = np.array([[-0.00377177, 0.54720216, -0.83699198, 0.766],
                        [0.99981506, -0.01372054, -0.01347562, -0.276],
                        [-0.01885787, -0.83688801, -0.54704921, 0.62],
                        [0., 0., 0., 1.]])

# Derived
workspace = [-0.4, 0.4, -0.6, 0.1, -0.08, 0.5]
target_space = [-0.4, 0.4, -0.6, -0.15, -0.06, 0.4]
table2camera = np.linalg.inv(camera2table)
base2camera = np.linalg.inv(camera2base)
