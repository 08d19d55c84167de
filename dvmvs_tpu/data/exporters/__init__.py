"""Dataset exporters: convert raw dataset formats into the canonical scene
layout (images/*.png RGB, depth/*.png uint16 mm, poses.txt flattened 4x4
camera-to-world per line, K.txt 3x3).

Reference exporters: dataset/{scannet,7scenes,tum-rgbd,rgbdscenes,
augmented-iclnuim}-export/ — rewritten for Python 3 with argparse paths.
"""
