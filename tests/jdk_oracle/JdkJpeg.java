import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;
import java.awt.image.BufferedImage;
import java.io.*;

/**
 * Cross-implementation JPEG oracle for tests/test_jpeg.py: the JDK ships its
 * own independent JPEG codec (javax.imageio), so the engine's from-scratch
 * Python codec can be verified against a second implementation with no
 * network and no PIL. Modes:
 *   decode in.img out.ppm          - JDK decodes a JPEG/PNG, writes binary P6
 *   encode in.ppm out.jpg quality [prog] - JDK encodes a P6 as JPEG
 *                                    (quality 0-100; 5th arg "prog" asks for
 *                                    a progressive SOF2 stream)
 *   encodepng in.ppm out.png       - JDK encodes a P6 as PNG (its own filter
 *                                    heuristics: Sub/Up/Average/Paeth rows)
 */
public class JdkJpeg {
    public static void main(String[] args) throws Exception {
        if (args[0].equals("decode")) {
            BufferedImage img = ImageIO.read(new File(args[1]));
            if (img == null) throw new IOException("JDK could not decode " + args[1]);
            writePpm(img, args[2]);
        } else if (args[0].equals("wavraw")) {
            javax.sound.sampled.AudioInputStream ais =
                    javax.sound.sampled.AudioSystem.getAudioInputStream(new File(args[1]));
            javax.sound.sampled.AudioFormat f = ais.getFormat();
            byte[] all = ais.readAllBytes();
            try (DataOutputStream os = new DataOutputStream(
                    new BufferedOutputStream(new FileOutputStream(args[2])))) {
                os.writeBytes((int) f.getSampleRate() + " " + f.getChannels()
                        + " " + f.getSampleSizeInBits() + "\n");
                os.write(all);
            }
        } else if (args[0].equals("encodepng")) {
            BufferedImage img = readPpm(args[1]);
            if (args.length > 3 && args[3].equals("adam7")) {
                ImageWriter w = ImageIO.getImageWritersByFormatName("png").next();
                ImageWriteParam p = w.getDefaultWriteParam();
                javax.imageio.metadata.IIOMetadata md = w.getDefaultImageMetadata(
                        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), p);
                String f = "javax_imageio_png_1.0";
                javax.imageio.metadata.IIOMetadataNode root =
                        (javax.imageio.metadata.IIOMetadataNode) md.getAsTree(f);
                javax.imageio.metadata.IIOMetadataNode ihdr =
                        (javax.imageio.metadata.IIOMetadataNode) root.getElementsByTagName("IHDR").item(0);
                ihdr.setAttribute("interlaceMethod", "adam7");
                md.setFromTree(f, root);
                try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(args[2]))) {
                    w.setOutput(os);
                    w.write(null, new IIOImage(img, null, md), p);
                }
                w.dispose();
            } else {
                ImageIO.write(img, "png", new File(args[2]));
            }
        } else {
            BufferedImage img = readPpm(args[1]);
            boolean gray = false, prog = false;
            for (int a = 4; a < args.length; a++) {
                if (args[a].equals("gray")) gray = true;
                if (args[a].equals("prog")) prog = true;
            }
            if (gray) {
                BufferedImage g = new BufferedImage(
                        img.getWidth(), img.getHeight(), BufferedImage.TYPE_BYTE_GRAY);
                g.getGraphics().drawImage(img, 0, 0, null);
                img = g;
            }
            float q = Float.parseFloat(args[3]) / 100f;
            ImageWriter w = ImageIO.getImageWritersByFormatName("jpeg").next();
            ImageWriteParam p = w.getDefaultWriteParam();
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionQuality(q);
            if (prog)
                p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
            try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(args[2]))) {
                w.setOutput(os);
                w.write(null, new IIOImage(img, null, null), p);
            }
            w.dispose();
        }
    }

    static void writePpm(BufferedImage img, String path) throws IOException {
        int w = img.getWidth(), h = img.getHeight();
        boolean gray = img.getType() == BufferedImage.TYPE_BYTE_GRAY;
        try (DataOutputStream os = new DataOutputStream(
                new BufferedOutputStream(new FileOutputStream(path)))) {
            os.writeBytes("P6\n" + w + " " + h + "\n255\n");
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    if (gray) {
                        // getRGB() would run the linear-gray -> sRGB gamma
                        // conversion and brighten every sample; read the
                        // raster's raw byte instead
                        int g = img.getRaster().getSample(x, y, 0);
                        os.writeByte(g); os.writeByte(g); os.writeByte(g);
                    } else {
                        int rgb = img.getRGB(x, y);
                        os.writeByte((rgb >> 16) & 0xFF);
                        os.writeByte((rgb >> 8) & 0xFF);
                        os.writeByte(rgb & 0xFF);
                    }
                }
        }
    }

    static BufferedImage readPpm(String path) throws IOException {
        try (DataInputStream is = new DataInputStream(
                new BufferedInputStream(new FileInputStream(path)))) {
            if (!token(is).equals("P6")) throw new IOException("not P6");
            int w = Integer.parseInt(token(is));
            int h = Integer.parseInt(token(is));
            token(is); // maxval
            BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
            byte[] row = new byte[w * 3];
            for (int y = 0; y < h; y++) {
                is.readFully(row);
                for (int x = 0; x < w; x++)
                    img.setRGB(x, y, ((row[3 * x] & 0xFF) << 16)
                            | ((row[3 * x + 1] & 0xFF) << 8) | (row[3 * x + 2] & 0xFF));
            }
            return img;
        }
    }

    static String token(DataInputStream is) throws IOException {
        StringBuilder sb = new StringBuilder();
        int c;
        while ((c = is.read()) != -1) {
            if (Character.isWhitespace(c)) { if (sb.length() > 0) break; }
            else sb.append((char) c);
        }
        return sb.toString();
    }
}
