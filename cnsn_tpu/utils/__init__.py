from .meters import AverageMeter, get_log_dir_path

__all__ = ["AverageMeter", "get_log_dir_path"]
