"""UDF surface — pandas-UDF-backed operators mirroring the reference's
YOLO inference + NMS (SURVEY.md §2.3). Populated in M3."""
