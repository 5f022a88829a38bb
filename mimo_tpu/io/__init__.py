from mimo_tpu.io.loader import MmapDataset, csv_to_bin, write_bin
