"""ROS integration (reference: Examples_old/ROS/ORB_SLAM3/src/ros_*.cc)."""
