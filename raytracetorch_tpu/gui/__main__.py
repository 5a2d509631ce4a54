"""``python -m raytracetorch_tpu.gui [project.rtt] [--port 8000]``."""

from .server import run

if __name__ == '__main__':
    run()
