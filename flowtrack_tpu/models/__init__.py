"""Model zoo: PoseResNet (Simple Baselines) + FlowNet family."""

from flowtrack_tpu.models.pose_resnet import PoseResNet, get_pose_net  # noqa: F401
