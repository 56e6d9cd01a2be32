from .image_io import read_image, write_image, read_flo, write_flo, \
    read_stevimg, write_stevimg
from .exr_io import (read_exr, read_exr_channel, write_exr, is_exr_file,
                     exr_channels)
from .pointcloud_io import (PointCloud, open_point_cloud, save_point_cloud,
                            open_point_cloud_stream,
                            read_las, write_las, read_pcd, write_pcd)

__all__ = [
    "read_image", "write_image", "read_flo", "write_flo",
    "read_stevimg", "write_stevimg",
    "PointCloud", "open_point_cloud", "save_point_cloud",
    "open_point_cloud_stream",
    "read_las", "write_las", "read_pcd", "write_pcd",
]
