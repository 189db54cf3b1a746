"""Detection side workloads (reference ``ssd/``, ``fashion*.py``,
``vision/``): SSD-style detector, box/NMS machinery, COCO-style evaluation."""
