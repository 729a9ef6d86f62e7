import sys

from mpi_bicgstab_tpu.cli import main

sys.exit(main())
