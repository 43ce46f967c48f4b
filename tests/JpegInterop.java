// Cross-implementation fixture for tests/test_jpegcodec.py: the JDK's
// built-in ImageIO JPEG codec acts as the independent second
// implementation our pure-numpy baseline codec is checked against.
// Modes:
//   encode <w> <h> <gray|color> <out.jpg>  -- write a deterministic
//       pattern as JPEG, then print ImageIO's own decode of that file
//       (the ground truth our decoder must match within tolerance).
//   decode <in.jpg>                        -- print decoded RGB.
// Output: first line "w h", then w*h lines "r g b" in raster order.
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.io.File;

public class JpegInterop {
    public static void main(String[] args) throws Exception {
        if (args[0].equals("encode")) {
            int w = Integer.parseInt(args[1]);
            int h = Integer.parseInt(args[2]);
            boolean gray = args[3].equals("gray");
            BufferedImage img = new BufferedImage(
                w, h, gray ? BufferedImage.TYPE_BYTE_GRAY : BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < h; y++) {
                for (int x = 0; x < w; x++) {
                    int r, g, b;
                    if (gray) {
                        r = g = b = (x * 3 + y * 2) % 256;
                    } else {
                        // smooth ramps so 4:2:0 chroma upsampling
                        // differences stay small
                        r = (x * 2 + y) % 256;
                        g = (y * 3) % 256;
                        b = (x + y) % 256;
                    }
                    img.setRGB(x, y, (r << 16) | (g << 8) | b);
                }
            }
            File f = new File(args[4]);
            ImageIO.write(img, "jpg", f);
            dump(ImageIO.read(f));
        } else {
            dump(ImageIO.read(new File(args[1])));
        }
    }

    static void dump(BufferedImage img) {
        StringBuilder sb = new StringBuilder();
        sb.append(img.getWidth()).append(' ').append(img.getHeight()).append('\n');
        boolean oneBand = img.getRaster().getNumBands() == 1;
        for (int y = 0; y < img.getHeight(); y++) {
            for (int x = 0; x < img.getWidth(); x++) {
                int r, g, b;
                if (oneBand) {
                    // raw JPEG sample — getRGB would route gray through
                    // the linear<->sRGB color management and posterize
                    r = g = b = img.getRaster().getSample(x, y, 0);
                } else {
                    int p = img.getRGB(x, y);
                    r = (p >> 16) & 255;
                    g = (p >> 8) & 255;
                    b = p & 255;
                }
                sb.append(r).append(' ').append(g).append(' ').append(b).append('\n');
            }
        }
        System.out.print(sb);
    }
}
