"""The 80 COCO class names used by the reference's YOLOv8 postprocessing
(/root/reference/src/main/java/com/video/streaming/processor/YOLODetector.java:35-46).
Public, standard COCO ordering."""

COCO_CLASSES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep",
    "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)


def coco_sql_array() -> str:
    """DuckDB array literal of the class names, for oracle SQL that has
    to mirror a Spark-side ``F.array(*COCO_CLASSES)`` lookup."""
    inner = ", ".join("'" + c.replace("'", "''") + "'" for c in COCO_CLASSES)
    return f"[{inner}]"
