from .logging import ScalarLogger, print_args, setup_logger
